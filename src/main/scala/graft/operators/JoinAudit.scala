package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight equi-join cardinality audit: the EXACT output row count
  * a join would produce, per key and in total, from two cheap
  * aggregations — WITHOUT running the join. At 100 TB this is the
  * difference between discovering a many-to-many blow-up (a null-ish
  * placeholder key, a duplicated dimension row) in a histogram that
  * costs two map-side-combined shuffles of (key, count) pairs, versus
  * discovering it as a 400-billion-row stage that never finishes.
  *
  * Per key: `out_rows = n_left · n_right` (the equi-join's exact
  * contribution). The same frame answers skew sizing
  * ([[SkewJoin.suggestSalts]] consumes the max), referential checks
  * (left-only / right-only keys = the anti-join counts), and whether
  * `broadcast` is safe (distinct right keys × payload width).
  */
object JoinAudit {

  /** (keys..., n_left, n_right, out_rows) for every key present on
    * either side; absent sides count 0 (so out_rows 0 marks an
    * anti-join key). */
  def keyHistogram(left: DataFrame, right: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val l = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_right"))
    l.join(r, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        (coalesce(col("n_left"), lit(0L)) *
          coalesce(col("n_right"), lit(0L))).as("out_rows")): _*)
  }

  /** One-row audit summary: total join output, matched/left-only/
    * right-only key counts, and the hottest key's contribution (the
    * straggler predictor). All integer-exact. */
  def summary(left: DataFrame, right: DataFrame,
              keys: Seq[String]): DataFrame =
    keyHistogram(left, right, keys).agg(
      sum(col("out_rows")).as("join_rows"),
      count(when(col("n_left") > 0 && col("n_right") > 0, 1)).as("matched_keys"),
      count(when(col("n_right") === 0, 1)).as("left_only_keys"),
      count(when(col("n_left") === 0, 1)).as("right_only_keys"),
      max(col("out_rows")).as("hottest_key_rows"))
}
