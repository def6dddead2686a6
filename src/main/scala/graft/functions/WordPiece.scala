package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training — the third member of the
  * tokenizer triad next to [[Bpe]] (frequency-scored merges) and
  * [[Unigram]] (hard-EM pruning). WordPiece is BPE's loop with a
  * LIKELIHOOD merge score: pick the adjacent pair maximizing
  * `count(a,b) / (count(a) · count(b))` — the pair whose merge most
  * increases a unigram LM's corpus likelihood — instead of the raw
  * pair count, and mark word-internal continuation symbols with the
  * `##` prefix (the BERT convention).
  *
  * Determinism contract (the oracle replays every round): the score
  * is computed EXACTLY as `count(a,b)·10¹² div (count(a)·count(b))`
  * through DECIMAL(38,0) — integer floor division, no doubles, so
  * both engines land the same value bit-for-bit — with ties broken
  * (score desc, a asc, b asc); the merge applies greedy
  * left-to-right within each word ([[Bpe.foldMerge]]'s fold, with the
  * merged symbol `a + b.stripPrefix("##")` per the `##` algebra:
  * position-1 symbols never carry `##`, later symbols always do, so
  * the pair's right side always strips).
  *
  * Scale shape = [[Bpe]]: the corpus is touched once (word-TYPE
  * counts, map-side combined); each round over the type table costs
  * one pair explode + groupBy, one symbol explode + groupBy (the
  * denominator counts — WordPiece's only addition), two broadcastable
  * equi-joins of pair onto symbol counts, a TakeOrdered(1) argmax,
  * and a shuffle-free per-row fold merge; localCheckpoint per round.
  * The driver holds one merge row per round (vocabulary-sized
  * control-plane data, the watermark-read contract).
  */
object WordPiece {

  /** Learned model: ordered merge table (rank, lhs, rhs, pair count,
    * exact pico-scaled score) plus the post-merge word-type table. */
  final case class WordPieceModel(
      merges: Seq[(Int, String, String, Long, Long)],
      types: DataFrame)

  /** Corpus word types with counts and `##`-marked initial symbols:
    * (word, n, s) where s = [c₁, ##c₂, …, ##cₙ]. */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    graft.operators.Spread.ensure(
      docs.select(TextFunctions.words(col(textCol)).as("w")))
      .select(explode_outer(col("w")).as("word")) // see Bpe.wordTypes
      .where(col("word").isNotNull)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("s", expr(
        "transform(sequence(1, length(word)), i -> " +
          "CASE WHEN i = 1 THEN substring(word, i, 1) " +
          "ELSE '##' || substring(word, i, 1) END)"))

  /** [[Bpe.foldMerge]] with an explicit merged symbol (the `##`
    * algebra makes merged ≠ a+b). */
  private def foldMergeTo(s: org.apache.spark.sql.Column,
                          a: String, b: String, merged: String)
      : org.apache.spark.sql.Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` likelihood-scored merges (stops early when no
    * adjacent pair remains). */
  def train(types0: DataFrame, numMerges: Int): WordPieceModel = {
    require(numMerges >= 1, "numMerges must be at least 1")
    var cur = types0.select(col("word"), col("n"), col("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val pairs = cur.where(size(col("s")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(s) - 2), " +
            "i -> struct(element_at(s, i + 1) AS a, element_at(s, i + 2) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
      // denominator: per-symbol occurrence counts (weighted by word
      // frequency) over the SAME type table
      val syms = cur.select(col("n"), explode(col("s")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("n")).as("scnt"))
      val scored = pairs
        .join(syms.select(col("sym").as("a"), col("scnt").as("ca")), Seq("a"))
        .join(syms.select(col("sym").as("b"), col("scnt").as("cb")), Seq("b"))
        .withColumn("score_pico", expr(
          "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000000000 " +
            "div (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)"))
      val best = scored.orderBy(col("score_pico").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val row = best(0)
        val (a, b) = (row.getAs[String]("a"), row.getAs[String]("b"))
        val merged = a + b.stripPrefix("##")
        merges += ((r, a, b, row.getAs[Long]("cnt"),
          row.getAs[Long]("score_pico")))
        cur = cur.select(col("word"), col("n"),
          foldMergeTo(col("s"), a, b, merged).as("s")).localCheckpoint()
        r += 1
      }
    }
    WordPieceModel(merges.toSeq, cur)
  }

  /** The merge table as a DataFrame: (merge_rank, lhs, rhs,
    * pair_count, score_pico). */
  def mergesDF(spark: SparkSession, model: WordPieceModel): DataFrame = {
    import spark.implicits._
    model.merges.toDF("merge_rank", "lhs", "rhs", "pair_count", "score_pico")
      .select(col("merge_rank").cast("long").as("merge_rank"),
        col("lhs"), col("rhs"), col("pair_count"), col("score_pico"))
  }
}
