package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection (C4 / RefinedWeb-style): a text
  * fragment that recurs across MANY DISTINCT DOCUMENTS of the same
  * group (site navigation, cookie banners, license footers) is
  * boilerplate, not content, and a training corpus wants it stripped
  * per-occurrence — document-level dedup never catches it because the
  * surrounding documents differ.
  *
  * The unit here is a word n-gram shingle (the synthetic corpus has no
  * line structure; on real web text the same operator runs over
  * lines). The pipeline is two aggregations and a semi-join, all keyed
  * by `(group, gram)` — at 100 TB the gram table is huge but the
  * shuffle is a plain hash partition on the gram key, and the flagged
  * set (df >= minDf) is orders of magnitude smaller than the corpus,
  * so the final semi-join shuffles only gram keys, never text. In
  * production the gram string would be `xxhash64`-ed before the
  * shuffle; the string key is kept here so the DuckDB oracle can
  * reproduce the grouping byte-for-byte.
  *
  * Reference analogue: the reference dedupes exact rows only
  * (`bp-scala-api-ingestions/dataSource bp/ModuleFunctions.scala`
  * `dropDuplicates` call sites); sub-document recurrence has no
  * counterpart there — this is part of the LLM-curation surface.
  */
object Boilerplate {

  /** (id, group, gram) rows: all word `n`-grams of `textCol`, split on
    * single spaces. Documents shorter than `n` words emit nothing. */
  def grams(docs: DataFrame, idCol: String, textCol: String,
            groupCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        split(col(textCol), " ").as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("id"), col("grp"),
        explode(transform(sequence(lit(0), size(col("ws")) - n),
          i => array_join(slice(col("ws"), i + 1, lit(n)), " "))).as("gram"))
  }

  /** The boilerplate gram set: `(grp, gram)` pairs occurring in at
    * least `minDf` distinct documents of the group. The inner
    * `distinct` is a partial-aggregating shuffle on (grp, gram, id) —
    * map-side combine collapses within-document repeats before any
    * network move. */
  def boilerplateGrams(g: DataFrame, minDf: Int): DataFrame =
    g.select(col("grp"), col("gram"), col("id")).distinct()
      .groupBy(col("grp"), col("gram")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select(col("grp"), col("gram"))

  /** Per-document boilerplate exposure: total gram count and how many
    * of those grams are corpus boilerplate within the document's
    * group. Integer-exact — safe for cross-engine hash comparison.
    * Downstream curation drops documents above a boiler ratio or
    * strips the flagged spans (compose with [[SpanDedup]]). */
  def docStats(docs: DataFrame, idCol: String, textCol: String,
               groupCol: String, n: Int = 5, minDf: Int = 3): DataFrame = {
    val g = grams(docs, idCol, textCol, groupCol, n)
    val boiler = boilerplateGrams(g, minDf)
    val total = g.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val flagged = g.join(boiler, Seq("grp", "gram"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_boiler"))
    total.join(flagged, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
  }
}
