package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group trend detection: the exact-OLS slope of value against
  * time — the metric-drift monitor that tells a pipeline "this
  * source's quality score is decaying" before a threshold alarm
  * would. The slope is computed from integer sufficient statistics
  * (n, Σx, Σy, Σxy, Σx²) in DECIMAL(38,0) and emitted as an exact
  * fixed-point ratio — a float OLS (or `corr`/`regr_slope` builtins)
  * can never hash-match across engines, this does.
  *
  * Units contract: x is SECONDS since the group's first observation
  * (per-group centering keeps Σx² far from overflow even for years
  * of µs timestamps), y is the value at 10⁻⁴ grain; the emitted
  * slope is y-units·10⁻⁴ PER DAY, truncated toward zero on both
  * engines. Groups with a single distinct timestamp report 0.
  *
  * Scale shape: one groupBy for the per-group epoch, a broadcast
  * join back, one aggregation for the moment sums — two scans, no
  * windows, no iteration.
  */
object Trend {

  /** (group, n, slope_y4_per_day) per group. */
  def slopeProfile(df: DataFrame, groupCol: Column, tsUsCol: Column,
                   valueCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"), tsUsCol.as("t_us"),
      (valueCol.cast("decimal(18,4)") * 10000).cast("long").as("ys"))
    val epochs = base.groupBy(col("g")).agg(min(col("t_us")).as("t0"))
    val xy = base.join(broadcast(epochs), Seq("g"))
      .select(col("g"), expr("(t_us - t0) div 1000000").as("x"),
        col("ys"))
    xy.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("ys").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("ys")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .select(col("g"), col("n"),
        expr("case when n * sxx - sx * sx = 0 then 0L else " +
          "cast((86400 * (n * sxy - sx * sy)) " +
          "div (n * sxx - sx * sx) as bigint) end")
          .as("slope_y4_per_day"))
  }
}
