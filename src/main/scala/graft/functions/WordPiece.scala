package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

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
      .sanitizedCheckpoint()
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
          foldMergeTo(col("s"), a, b, merged).as("s")).sanitizedCheckpoint()
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

  /** Merge-REPLAY segmentation: apply a saved merge list in training
    * order to a `##`-marked word-type table ([[wordTypes]]' shape) —
    * the encode path that reproduces training's own segmentation
    * states. NOTE this is not what BERT-family consumers run at
    * inference time (that is [[maximalMunch]]); replay and maximal
    * munch can genuinely disagree — see WordPieceSpec's divergence
    * case — because a replayed merge consumes symbols that a longer
    * later-learned vocab entry would have claimed under longest-match.
    */
  def applyMerges(types: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(types) { case (cur, (a, b)) =>
      cur.select(col("word"), col("n"),
        foldMergeTo(col("s"), a, b, a + b.stripPrefix("##")).as("s"))
    }

  /** The trained model's FINAL VOCABULARY: the initial alphabet (every
    * position-1 char and `##`-continuation present in the corpus word
    * types, occurrence-weighted count ≥ `minCount` — real WordPiece
    * vocabularies are frequency-truncated, which is what makes the
    * `[UNK]` path reachable at inference) plus one merged symbol per
    * learned merge — the artifact a WordPiece consumer actually ships.
    * Vocabulary-sized control-plane data (the watermark-read
    * contract), same as the merge table the driver already holds. */
  def vocab(types0: DataFrame, model: WordPieceModel,
            minCount: Long = 1L): Seq[String] = {
    val alphabet = types0
      .select(explode(col("s")).as("sym"), col("n"))
      .groupBy(col("sym")).agg(sum(col("n")).as("c"))
      .where(col("c") >= minCount)
      .collect().map(_.getString(0))
    (alphabet ++ model.merges.map { case (_, a, b, _, _) =>
      a + b.stripPrefix("##")
    }).distinct.sorted
  }

  /** Canonical WordPiece INFERENCE: greedy longest-match (maximal
    * munch) segmentation of word TYPES against the final vocabulary —
    * what BERT-family tokenizers run at inference time. At each
    * position take the LONGEST vocab piece matching (position-1 pieces
    * bare, later positions `##`-prefixed) and advance by its length; a
    * position with no match makes the WHOLE word `unk` (the `[UNK]`
    * contract — canonical WordPiece does not emit partial
    * segmentations).
    *
    * Scale shape: the munch itself is one `aggregate` fold over a
    * per-position match-length array, computed by one of two
    * strategies picked on vocab size ([[InlineVocabMax]]): small
    * vocabs inline as a constant array literal into a single
    * `transform` (no joins, no shuffle, pure WholeStageCodegen — the
    * gate's alphabet+merges vocab); production-sized vocabs (30k+
    * BERT pieces) switch to a broadcast-join probe
    * ([[maximalMunchJoin]]) so neither the codegen'd expression
    * (∝ maxLen·|V| inlined) nor the per-position probe cost (O(|V|)
    * array scan) grows with the vocabulary. Both paths segment word
    * TYPES, never occurrences, and return identical rows.
    *
    * @return (word, n, s, is_unk) with `s` the munched piece array
    *         (`[unk]` when is_unk)
    */
  def maximalMunch(types: DataFrame, vocabPieces: Seq[String],
                   unk: String = "[UNK]"): DataFrame = {
    require(vocabPieces.nonEmpty, "vocab must be non-empty")
    if (vocabPieces.size <= InlineVocabMax)
      maximalMunchInline(types, vocabPieces, unk)
    else maximalMunchJoin(types, vocabPieces, unk)
  }

  /** Vocab-size threshold between the two longest-match strategies:
    * up to here the vocab inlines into the per-position CASE (zero
    * joins, the fastest plan for the gate's alphabet+merges vocab);
    * beyond it the codegen'd expression would grow ∝ maxLen·|V| (a
    * 30k-piece BERT vocab is megabytes of CASE text) and the probe
    * cost ∝ |V| per position — the broadcast-join path keeps probes
    * O(1) hash lookups and the plan size constant. */
  val InlineVocabMax = 512

  /** Spark SQL single-quoted string literal: backslash is the escape
    * character in Spark's lexer, so it must itself be escaped BEFORE
    * quoting (a piece containing a backslash would otherwise
    * mis-parse or swallow the closing quote). */
  private def lit1(s: String) = "'" + s.flatMap {
    case '\\' => "\\\\"
    case '\'' => "\\'"
    case c => c.toString
  } + "'"

  /** The shared munch fold over a frame carrying `mm_len` (longest
    * vocab match length at each 1-based position, 0 = none):
    * positions before the cursor are skipped; a zero match length
    * poisons the word to [unk]; otherwise emit the matched piece and
    * advance the cursor by its length. */
  private def munchFromLens(withLens: DataFrame, unk: String): DataFrame = {
    val piece =
      "CASE WHEN i = 1 THEN substring(word, i, element_at(mm_len, i)) " +
        "ELSE '##' || substring(word, i, element_at(mm_len, i)) END"
    withLens.withColumn("mm", expr(
      s"""aggregate(
         |  sequence(1, length(word)),
         |  named_struct('nxt', 1, 'toks', cast(array() as array<string>),
         |               'unk', false),
         |  (acc, i) -> CASE
         |    WHEN acc.unk OR i < acc.nxt THEN acc
         |    WHEN element_at(mm_len, i) = 0 THEN named_struct(
         |      'nxt', length(word) + 1,
         |      'toks', array(${lit1(unk)}), 'unk', true)
         |    ELSE named_struct(
         |      'nxt', i + element_at(mm_len, i),
         |      'toks', concat(acc.toks, array($piece)), 'unk', false)
         |    END)""".stripMargin))
      .select(col("word"), col("n"),
        col("mm.toks").as("s"), col("mm.unk").as("is_unk"))
  }

  private[graft] def maximalMunchInline(types: DataFrame,
                                        vocabPieces: Seq[String],
                                        unk: String): DataFrame = {
    val maxLen = vocabPieces.map(_.stripPrefix("##").length).max
    val vlit = vocabPieces.map(lit1).mkString("array(", ",", ")")
    // longest vocab match length at each 1-based position (0 = none):
    // try lengths longest-first; candidate at position 1 is the bare
    // prefix, later positions carry the ## continuation marker
    val arms = (maxLen to 1 by -1).map { l =>
      s"WHEN i + ${l - 1} <= length(word) AND array_contains($vlit, " +
        s"CASE WHEN i = 1 THEN substring(word, i, $l) " +
        s"ELSE '##' || substring(word, i, $l) END) THEN $l"
    }.mkString(" ")
    munchFromLens(types.withColumn("mm_len", expr(
      s"transform(sequence(1, length(word)), i -> CASE $arms ELSE 0 END)")),
      unk)
  }

  /** The large-vocab longest-match: explode each word TYPE into its
    * (position, length) candidate substrings — O(len · maxLen) rows
    * per type, types not occurrences — and probe them against the
    * vocab as a BROADCAST hash join (one O(1) lookup per candidate,
    * vs the inline path's O(|V|) array scan), then fold the max hit
    * length per position back into the `mm_len` array via a
    * map_from_entries groupBy. The vocab rides the join as data, so
    * nothing is inlined into expression text (no parser/codegen
    * blowup at 30k+ pieces, no literal-escaping surface at all). */
  private[graft] def maximalMunchJoin(types: DataFrame,
                                      vocabPieces: Seq[String],
                                      unk: String): DataFrame = {
    val spark = types.sparkSession
    import spark.implicits._
    val maxLen = vocabPieces.map(_.stripPrefix("##").length).max
    val vocabDf = vocabPieces.toDF("piece")
    val probes = types.select(col("word"))
      .withColumn("i", explode(expr("sequence(1, length(word))")))
      .withColumn("l", explode(expr(
        s"sequence(1, least($maxLen, length(word) - i + 1))")))
      .withColumn("piece", expr(
        "CASE WHEN i = 1 THEN substring(word, i, l) " +
          "ELSE '##' || substring(word, i, l) END"))
    val lensMap = probes.join(broadcast(vocabDf), Seq("piece"))
      .groupBy(col("word"), col("i")).agg(max(col("l")).as("len"))
      .groupBy(col("word"))
      .agg(map_from_entries(collect_list(
        struct(col("i").cast("int").as("k"),
          col("len").cast("int").as("v")))).as("mm_map"))
    // words with zero vocab hits have no map row: element_at(null, i)
    // coalesces to 0 at every position → the [UNK] path
    munchFromLens(
      types.join(lensMap, Seq("word"), "left")
        .withColumn("mm_len", expr(
          "transform(sequence(1, length(word)), " +
            "i -> coalesce(element_at(mm_map, i), 0))"))
        .drop("mm_map"),
      unk)
  }

  /** Per-document subword statistics under [[maximalMunch]]
    * segmentation — [[Bpe.encodeStats]]' one-join shape (segmentation
    * per word TYPE, folded back over occurrences) plus the `[UNK]`
    * exposure a curation pipeline filters on: n_unk_words counts word
    * OCCURRENCES the vocab cannot segment. */
  def inferStats(docs: DataFrame, idCol: String, textCol: String,
                 munched: DataFrame): DataFrame = {
    val tok = graft.operators.Spread.ensure(
      docs.select(col(idCol).as("id"),
        TextFunctions.words(col(textCol)).as("w")))
      .select(col("id"), explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull) // see Bpe.wordTypes: lint-clean explode
    val typed = tok.join(
      munched.select(col("word"), col("s"), col("is_unk")), Seq("word"))
    val sub = typed.select(col("id"), explode(col("s")).as("sub"))
    val agg = sub.groupBy(col("id")).agg(
      count(lit(1)).as("n_subwords"),
      countDistinct(col("sub")).as("n_distinct_sub"))
    val nw = typed.groupBy(col("id")).agg(
      count(lit(1)).as("n_words"),
      sum(when(col("is_unk"), 1L).otherwise(0L)).as("n_unk_words"))
    docs.select(col(idCol).as("id"))
      .join(nw, Seq("id"), "left").join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("n_distinct_sub"), lit(0L)).as("n_distinct_sub"),
        coalesce(col("n_unk_words"), lit(0L)).as("n_unk_words"))
  }
}
