package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift report between a baseline and a current run of
  * the same pipeline — the monitoring primitive that catches a
  * upstream schema change, a broken filter, or a shifted source mix
  * BEFORE the drifted batch trains a model or lands in a serving
  * table.
  *
  * Both frames are histogrammed on the same fixed integer bins
  * ([[graft.sketch.Sketches.binColumn]]); the drift score is total
  * variation distance, TVD = ½·Σᵢ|pᵢ − qᵢ|. Everything is
  * integer-exact: per-bin contributions are |nᵃᵢ·Nᵇ − nᵇᵢ·Nᵃ|
  * (cross-multiplied so no ratio is ever summed — float sums are
  * reduction-order-dependent and would break cross-engine equality),
  * accumulated in DECIMAL(38,0), and the final score is emitted in
  * parts-per-million by integer division. Bin counts shuffle as ≤bins
  * cells per side regardless of row count — two scans, one tiny join.
  */
object Drift {

  /** Per-bin drift rows (bin, n_base, n_cur, contrib) followed by a
    * TOTAL row (bin = -1) carrying the corpus counts, the summed
    * contribution, and `tvd_ppm` = (500000·Σcontrib) div (Nᵃ·Nᵇ) —
    * 0 = identical distributions, 1e6 = disjoint. Requires both
    * frames non-empty. */
  def histogramDrift(base: DataFrame, cur: DataFrame, valueCol: String,
                     lo: Long, binWidth: Long, bins: Int): DataFrame = {
    def hist(df: DataFrame, out: String): DataFrame =
      df.select(graft.sketch.Sketches
          .binColumn(col(valueCol), lo, binWidth, bins).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    val joined = hist(base, "n_base")
      .join(hist(cur, "n_cur"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum(col("n_base")).as("tot_base"), sum(col("n_cur")).as("tot_cur"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val withContrib = joined.crossJoin(broadcast(totals)) // 1-row totals
      .withColumn("contrib",
        abs(d(col("n_base")) * d(col("tot_cur")) -
          d(col("n_cur")) * d(col("tot_base"))))
    val perBin = withContrib.select(col("bin"), col("n_base"),
      col("n_cur"), col("contrib").cast("long").as("contrib"),
      lit(null).cast("long").as("tvd_ppm"))
    val total = withContrib.groupBy()
      .agg(sum(col("contrib")).as("s"),
        max(col("tot_base")).as("tb"), max(col("tot_cur")).as("tc"))
      .select(lit(-1L).as("bin"), col("tb").as("n_base"),
        col("tc").as("n_cur"), col("s").cast("long").as("contrib"),
        expr("cast((cast(500000 as decimal(38,0)) * s) div " +
          "(cast(tb as decimal(38,0)) * cast(tc as decimal(38,0))) " +
          "as bigint)").as("tvd_ppm"))
    perBin.unionByName(total)
  }
}
