package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative n-gram language-model coverage — the cheap,
  * engine-exact stand-in for perplexity-based quality scoring: score
  * each document by how much of it recurs elsewhere in the corpus.
  * A document whose word bigrams are almost all corpus-frequent is
  * template/boilerplate; one whose bigrams are almost all unique is
  * either fresh prose or garbage — both ends are what a curation
  * pipeline flags for different treatment (dedup-adjacent trimming vs
  * quality review). Gopher-style heuristics
  * ([[QualityFilter]]) look INSIDE one document; this signal looks
  * ACROSS the corpus.
  *
  * All outputs are integer counts (no floats, no log-probs), so the
  * signal hash-matches any engine — a float perplexity never would.
  * Callers derive ratios downstream (covered/total) where approximate
  * comparison is acceptable.
  *
  * Scale shape: one explode to bigram occurrences, then three
  * NODE-KEYED shuffles — groupBy (id, bigram), a `sum over
  * (partition by bigram)` window that attaches the corpus count
  * WITHOUT a self-join (the window reuses the grouped frame), and the
  * final groupBy(id). Partial aggregation applies throughout; no
  * corpus-sized broadcast, no all-pairs anything.
  */
object LmCoverage {

  /** Per-document bigram coverage vs the corpus:
    * (id, n_bigrams, n_distinct, n_covered) where `n_bigrams` counts
    * occurrences, `n_distinct` distinct bigrams in the doc, and
    * `n_covered` the distinct bigrams whose CORPUS occurrence count
    * (including this doc's own) reaches `minCount`. Documents with
    * fewer than two words report zeros. */
  def bigramCoverage(df: DataFrame, idCol: String, textCol: String,
                     minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, "minCount must be at least 1")
    val base = graft.operators.Spread.ensure(
      df.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
    // consecutive word pairs, one row per OCCURRENCE (the trivial
    // element_at pair in the lambda is fine — w is a materialized
    // array, not a recomputed expression). The <2-words guard lives
    // INSIDE the explode as an empty-array branch: exploding [] drops
    // the row with no Filter node, so the scan keeps a clean
    // no-unpushable-filter plan (sequence(0, -1) would count DOWN —
    // the branch is semantics, not just lint hygiene).
    val bg = base.select(col("id"), explode(expr(
      "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), " +
        "i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2))) " +
        "ELSE array() END")).as("bg"))
    val perDoc = bg.groupBy(col("id"), col("bg"))
      .agg(count(lit(1)).as("occ"))
    // corpus count per bigram = sum of per-doc occurrences over a
    // bigram-partitioned window: no second aggregate + join pass
    val withCorpus = perDoc.withColumn("corpus_cnt",
      sum(col("occ")).over(Window.partitionBy(col("bg"))))
    val agg = withCorpus.groupBy(col("id")).agg(
      sum(col("occ")).as("n_bigrams"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("corpus_cnt") >= minCount, 1L).otherwise(0L))
        .as("n_covered"))
    // keep one row per input document (short docs produce no bigrams)
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
  }
}
