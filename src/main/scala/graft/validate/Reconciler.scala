package graft.validate

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Source/target reconciliation (SURVEY §5.3) — the Bentley validator
  * (`bp-bentley-idms/Validation/validate_source_and_target_tags.scala:36-66`):
  * per-key count parity plus min/max timestamp alignment, and the
  * anti-join "rows in source missing from target" idiom.
  */
object Reconciler {

  /** Per-key (count, min ts, max ts) comparison. Returns one row per
    * key present on either side with both sides' stats and a `matched`
    * flag. */
  def reconcile(source: DataFrame, target: DataFrame, keyCol: String,
                tsCol: String): DataFrame = {
    def stats(df: DataFrame, pfx: String) =
      df.groupBy(col(keyCol)).agg(
        count(lit(1)).as(s"${pfx}_count"),
        min(col(tsCol)).as(s"${pfx}_min_ts"),
        max(col(tsCol)).as(s"${pfx}_max_ts"))
    stats(source, "src").join(stats(target, "tgt"), Seq(keyCol), "full_outer")
      .withColumn("matched",
        col("src_count") <=> col("tgt_count") &&
          col("src_min_ts") <=> col("tgt_min_ts") &&
          col("src_max_ts") <=> col("tgt_max_ts"))
  }

  /** Keys in source with no target rows (the reconciliation anti-join). */
  def missingInTarget(source: DataFrame, target: DataFrame, keyCol: String): DataFrame =
    source.select(col(keyCol)).distinct()
      .join(target.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
}
