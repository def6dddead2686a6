package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling to a regular grid with LOCF (last
  * observation carried forward) — the gap-fill that turns irregular
  * event streams into the fixed-step series feature pipelines and
  * downsampled dashboards consume. Three scale-shaped stages, all
  * partitioned by the series key:
  *
  *  1. per (key, bucket): keep the LAST observation, selected by
  *     `max(struct(order..., value))` — an aggregation (map-side
  *     partial), not a window over raw events;
  *  2. per key: a dense bucket spine via `sequence()` between the
  *     key's own min and max bucket — generated in the engine,
  *     exploded where the key's data lives, never on the driver;
  *  3. one `last(..., ignoreNulls)` running window over the spine
  *     fills the gaps.
  *
  * Buckets before a key's first observation stay null (LOCF has
  * nothing to carry). The spine is bounded per key, so a key active
  * for an hour doesn't pay for the corpus' full time range.
  */
object Resample {

  /** `df` must carry an integral `tsCol`; `bucketSize` is in the same
    * unit (e.g. nanos → 3.6e12 for hourly). `orderCols` break ties
    * within a bucket deterministically (e.g. ts, event_id). Output:
    * (keys..., bucket, value_filled). */
  def locfResample(df: DataFrame, keys: Seq[String], tsCol: String,
                   orderCols: Seq[String], valueCol: String,
                   bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive: $bucketSize")
    val k: Seq[Column] = keys.map(col)
    val o = df.select(k ++ Seq(
      expr(s"`$tsCol` div $bucketSize").as("bucket"),
      struct(orderCols.map(col) :+ col(valueCol).as("__v"): _*).as("__obs")): _*)
    val obs = o.groupBy(k :+ col("bucket"): _*)
      .agg(max(col("__obs")).getField("__v").as("__last"))
    val spine = o.groupBy(k: _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(k :+ explode(sequence(col("__lo"), col("__hi"))).as("bucket"): _*)
    val w = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, keys :+ "bucket", "left")
      .select(k ++ Seq(col("bucket"),
        last(col("__last"), ignoreNulls = true).over(w)
          .as("value_filled")): _*)
  }
}
