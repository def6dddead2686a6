package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Distributed byte-pair-encoding tokenizer training — the
  * vocabulary-learning step of an LLM data pipeline, run over the
  * corpus WORD-TYPE table (the classic Sennrich formulation): count
  * adjacent symbol pairs weighted by word frequency, merge the most
  * frequent pair everywhere, repeat. Deterministic end to end: the
  * argmax tie-breaks by (count desc, left asc, right asc) and the
  * merge applies GREEDY LEFT-TO-RIGHT within each word (a run `aaa`
  * under merge (a,a) becomes `[aa, a]`), so an independent serial
  * engine replays the exact same merge table.
  *
  * Scale shape: the corpus is touched ONCE (tokenize → word-type
  * counts, map-side combined); every merge round then runs over the
  * type table only — pair counts are an explode + groupBy(a, b) with
  * partial aggregation, the argmax is a TakeOrdered(1), and the merge
  * is a per-row array fold (no shuffle at all). Per-round cost is
  * O(types), the textbook BPE bound; the type table is
  * localCheckpointed every round so round k's argmax never re-runs
  * rounds 1..k-1. At production merge counts (30k+) a row-per-round
  * pass is the wrong algorithm tier — batch non-interacting merges
  * per pass or maintain a pair index; the round structure here is the
  * distributed-correct baseline those optimize.
  *
  * The driver holds only the merge table itself (one row per merge —
  * vocabulary-sized control-plane data, same bounded-collect contract
  * as watermark reads).
  */
object Bpe {

  /** Learned model: the ordered merge table plus the post-merge
    * word-type table (word, n, s) for join-based encoding. */
  final case class BpeModel(merges: Seq[(Int, String, String, Long)],
                            types: DataFrame)

  /** Corpus word types with counts and initial character symbols:
    * (word, n, s: array&lt;string&gt;). */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    graft.operators.Spread.ensure(
      docs.select(TextFunctions.words(col(textCol)).as("w")))
      // explode_outer + null filter ≡ explode, but skips
      // InferFiltersFromGenerate's `size(words(text)) > 0` scan
      // filter (unpushable, double-evaluates the tokenize regex)
      .select(explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("s", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** One greedy left-to-right merge of the adjacent pair (a, b) → ab
    * inside a symbol array, as a per-row fold (`aaa` + (a,a) → `[aa,
    * a]`): the accumulator's last element only matches `a` if it was
    * NOT itself just merged. */
  private[graft] def foldMerge(s: org.apache.spark.sql.Column,
                                   a: String, b: String)
      : org.apache.spark.sql.Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges over the type table (stops early if no
    * adjacent pair remains). */
  def train(types0: DataFrame, numMerges: Int): BpeModel = {
    require(numMerges >= 1, "numMerges must be at least 1")
    var cur = types0.select(col("word"), col("n"), col("s"))
      .sanitizedCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
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
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, cnt))
        cur = cur.select(col("word"), col("n"),
          foldMerge(col("s"), a, b).as("s")).sanitizedCheckpoint()
        r += 1
      }
    }
    BpeModel(merges.toSeq, cur)
  }

  /** The merge table as a DataFrame: (merge_rank, lhs, rhs,
    * pair_count). */
  def mergesDF(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .select(col("merge_rank").cast("long").as("merge_rank"),
        col("lhs"), col("rhs"), col("pair_count"))
  }

  /** Join-based encoding statistics: each document's word occurrences
    * joined to the merged type table — the corpus is re-touched once,
    * every word's segmentation is computed once per TYPE, not per
    * occurrence. Returns (id, n_words, n_subwords, n_distinct_sub);
    * documents with no words report zeros. */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  types: DataFrame): DataFrame = {
    val tok = graft.operators.Spread.ensure(
      docs.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
      .select(col("id"), explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull) // see wordTypes: lint-clean explode
    val sub = tok.join(types.select(col("word"), col("s")), Seq("word"))
      .select(col("id"), explode(col("s")).as("sub"))
    val agg = sub.groupBy(col("id")).agg(
      count(lit(1)).as("n_subwords"),
      countDistinct(col("sub")).as("n_distinct_sub"))
    val nw = tok.groupBy(col("id")).agg(count(lit(1)).as("n_words"))
    docs.select(col(idCol).as("id"))
      .join(nw, Seq("id"), "left").join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("n_distinct_sub"), lit(0L)).as("n_distinct_sub"))
  }
}
