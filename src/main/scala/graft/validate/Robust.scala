package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group anomaly statistics: median and MAD (median
  * absolute deviation) instead of mean/σ — the z-score detector
  * (q_outliers) breaks down exactly when it matters, because the
  * outliers it hunts inflate the σ it thresholds with (masking);
  * the 50% breakdown point of median/MAD does not.
  *
  * Exactness contract: "median" is the LOWER median — the element at
  * rank ⌈n/2⌉ in value order — not the interpolated midpoint.
  * Interpolation is a float average whose result differs between
  * engines at the last ulp; rank selection is pure ordering on exact
  * DECIMAL values, so every number here hash-matches the oracle.
  * Equal values make the rank-pick order-independent at ties.
  *
  * Scale shape: two windowed rank passes per group (values, then
  * absolute deviations) — the same shuffle/sort as any per-key
  * sessionization — plus a broadcast of the tiny per-group medians
  * between them. No sampling, no approximation.
  */
object Robust {

  /** Per-group robust profile: (group, n, median, mad, n_outliers)
    * where outliers are rows with |v − median| > k·MAD. `k` is an
    * integer multiplier (the usual "k sigma" at MAD scale —
    * k=5 ≈ 3.4σ for normal data). Groups where MAD = 0 (over half
    * the values identical) count only rows strictly different from
    * the median as outliers when k ≥ 1 never fires on |d| = 0.
    * Values are taken at DECIMAL(18,4); medians emit as DOUBLE
    * (exact decimal → correctly-rounded double on both engines). */
  def medianMadProfile(df: DataFrame, groupCol: Column, valueCol: Column,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val v = valueCol.cast("decimal(18,4)")
    val base = df.select(groupCol.as("g"), v.as("v"))
    val medians = lowerMedian(base, "v").withColumnRenamed("m", "med")
    val withDev = base.join(broadcast(medians), Seq("g"))
      .withColumn("d", abs(col("v") - col("med")))
    val mads = lowerMedian(withDev.select(col("g"), col("d").as("v")), "v")
      .withColumnRenamed("m", "mad")
    withDev.join(broadcast(mads), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("median_dec"), // constant per group
        max(col("mad")).as("mad_dec"),
        sum(when(col("d") > col("mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g"), col("n"),
        col("median_dec").cast("double").as("median"),
        col("mad_dec").cast("double").as("mad"),
        col("n_outliers"))
  }

  /** Lower median per group of column `c`: the value at rank ⌈n/2⌉
    * ascending. Returns (g, m). */
  private def lowerMedian(df: DataFrame, c: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col(c))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .where(col("__rn") === expr("(__n + 1) div 2")) // ⌈n/2⌉, NOT `/`
      // (Column `/` on longs is DOUBLE division in Spark)
      .select(col("g"), col(c).as("m"))
  }
}
