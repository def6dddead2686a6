package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of algebraic aggregates — the materialized-
  * view pattern: keep a small per-group state table, fold each new
  * delta batch into it, and NEVER rescan the base data. count/sum/
  * min/max are algebraic (state merges associatively), so
  * `state(base ∪ delta) = merge(state(base), state(delta))` exactly —
  * the identity the spec asserts and the oracle query checks.
  *
  * At 100 TB this is the difference between an O(delta) nightly job
  * and an O(corpus) one. avg/std derive from (n, sum, sum²) power
  * sums (see q_numeric_profile); true holistic aggregates (exact
  * median) don't maintain incrementally — use sketches (KMV/CMS in
  * `graft.sketch`) for those.
  *
  * State schema: (group, n, sum_v DECIMAL — exact, order-independent,
  * min_v, max_v). */
object AggMaintain {

  /** Build aggregate state from a batch of rows. */
  def state(rows: DataFrame, groupCol: String, valueCol: String): DataFrame =
    rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 4))).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold a delta state into an existing state (either side may have
    * groups the other lacks). Both inputs must share the state
    * schema; the result does too, so folds chain. */
  def merge(cur: DataFrame, delta: DataFrame): DataFrame = {
    val groupCol = cur.columns.head
    cur.unionByName(delta)
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}
