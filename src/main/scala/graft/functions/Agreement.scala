package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Inter-annotator agreement for label-curation pipelines: when two
  * labelers (human raters, heuristic labeling functions, model
  * versions) assign categories to the same items, raw percent
  * agreement overstates reliability — Cohen's kappa corrects for the
  * agreement expected from the raters' marginal label distributions
  * alone (Cohen, "A coefficient of agreement for nominal scales",
  * 1960). The weak-supervision stack (label votes, NB classify)
  * needs this to decide whether two labeling functions genuinely
  * corroborate or just share a prior.
  *
  * All arithmetic is exact ppm fixed point (floor division, with the
  * scaled intermediates in DECIMAL(38,0) so n up to ~10¹² items
  * cannot overflow), so the statistic hash-matches any engine — a
  * float kappa never would under re-ordered reduction.
  *
  * Scale design: one groupBy over the (a, b) label pairs (cardinality
  * = |labels|², tiny), then scalar arithmetic on the contingency
  * margins — the only shuffle is the map-side-combined pair count,
  * independent of item volume.
  */
object Agreement {

  /** Cohen's kappa between two label columns, one output row:
    * (n, agree_n, po_ppm, pe_ppm, kappa_ppm) where po is observed
    * agreement, pe is chance agreement from the marginals, and
    * kappa_ppm = 10⁶·(po − pe)/(10⁶ − pe) in floor-divided ppm.
    * Rows where either label is null are excluded (un-rated items).
    */
  def cohenKappaPpm(df: DataFrame, a: Column, b: Column): DataFrame = {
    // the |labels|² contingency table feeds three aggregations below;
    // materialize it once (localCheckpoint — tiny, auto-released) so
    // the corpus scan + label expressions run a single time. The
    // null-rater filter runs AFTER the aggregate ON PURPOSE: a where
    // before it pushes `b IS NOT NULL` beneath the projection, and
    // with an expensive label expression (q_kappa's 5-language
    // scorer) the pushed predicate re-evaluates it per row — measured
    // 3× the query cost. Nulls group into their own cells (tiny) and
    // die here against checkpointed attributes nothing can push past.
    val pairs = df.select(a.as("la"), b.as("lb"))
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("c"))
      .sanitizedCheckpoint()
      .where(col("la").isNotNull && col("lb").isNotNull)
    // contingency margins: row sums per a-label × column sums per
    // b-label give pe; the diagonal gives po. Everything below is
    // over the tiny |labels|² table.
    pairs.agg(
        sum(col("c")).as("n"),
        sum(when(col("la") === col("lb"), col("c")).otherwise(0L))
          .as("agree_n"))
      .crossJoin(
        pairs.groupBy(col("la")).agg(sum(col("c")).as("ra"))
          .join(pairs.groupBy(col("lb")).agg(sum(col("c")).as("cb"))
              .withColumnRenamed("lb", "la"),
            Seq("la"), "inner")
          .agg(sum(expr(
            "cast(ra as decimal(38,0)) * cast(cb as decimal(38,0))"))
            .as("rc")))
      .select(
        col("n"), col("agree_n"),
        expr("cast((1000000 * cast(agree_n as decimal(38,0))) div n as bigint)")
          .as("po_ppm"),
        expr("cast((1000000 * coalesce(rc, cast(0 as decimal(38,0)))) " +
          "div (cast(n as decimal(38,0)) * n) as bigint)").as("pe_ppm"))
      .select(col("n"), col("agree_n"), col("po_ppm"), col("pe_ppm"),
        // kappa can be NEGATIVE (po < pe): both Spark's `div` and the
        // DuckDB oracle's `//` truncate toward zero (verified -7//2
        // = -3 in both), so plain integral division is already
        // engine-exact for any sign
        expr("case when pe_ppm = 1000000 then 1000000 else " +
          "(1000000 * (po_ppm - pe_ppm)) div (1000000 - pe_ppm) end")
          .as("kappa_ppm"))
  }
}
