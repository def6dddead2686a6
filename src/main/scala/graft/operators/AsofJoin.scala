package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LATEST right row with
  * `right.ts <= left.ts` in the same key group (the time-series point
  * lookup; DuckDB/kdb call it ASOF JOIN). Spark has no native form,
  * and the naive encoding is an inequality join that explodes into a
  * broadcast-nested-loop over every (left, right) pair.
  *
  * This is the scalable union+window form: tag each side, union on an
  * aligned schema, and carry the last non-null right payload forward
  * over a window ordered by (ts, side) — right rows sort before left
  * rows at equal timestamps, so the match is inclusive. ONE shuffle on
  * the key, sort-based window, no pair explosion; at 100 TB both
  * sides hash-partition by key and the window sorts within partitions.
  *
  * Ties: several right rows on the same (key, ts) make "the" as-of row
  * ambiguous — this picks the last in window order, like engines with
  * native ASOF pick one arbitrarily. Dedup the right side first
  * (`Windows.keepLatest`) when that matters.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftOnly = left.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == tsCol)
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
    def q(c: String) = col(s"`$c`")
    val keyTs = (keys :+ tsCol).map(q)
    val lp = left.select(keyTs ++ leftOnly.map(q) ++
      payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
      lit(1).as("__side"): _*)
    val rp = right.select(keyTs ++ leftOnly.map(c =>
      lit(null).cast(left.schema(c).dataType).as(c)) ++
      payloadCols.map(q) :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keys.map(q): _*)
      .orderBy(q(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .select(keyTs ++ leftOnly.map(q) ++
        payloadCols.map(c => last(q(c), ignoreNulls = true).over(w).as(c)) :+
        col("__side"): _*)
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** As-of join with a staleness bound — the feature-store rule
    * "use the latest observation, unless it is older than
    * `tolerance`". The latest right ROW still wins the match; its
    * payload is nulled when `left.ts − right.ts > tolerance`.
    *
    * Unlike [[asofJoin]]'s per-column carry, the carry here is one
    * struct of (ts, payload…), so the tolerance check and the payload
    * always come from the SAME right row even when payload values are
    * legitimately null. Same single key-shuffle + window plan.
    *
    * `tsCol` must be numeric (compare/subtract); pass `tolerance` in
    * the same unit. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
                        keys: Seq[String], tsCol: String,
                        payloadCols: Seq[String],
                        tolerance: Column): DataFrame = {
    val leftOnly = left.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == tsCol)
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
    def q(c: String) = col(s"`$c`")
    val keyTs = (keys :+ tsCol).map(q)
    val lp = left.select(keyTs ++ leftOnly.map(q) ++
      payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
      lit(1).as("__side"): _*)
    val rp = right.select(keyTs ++ leftOnly.map(c =>
      lit(null).cast(left.schema(c).dataType).as(c)) ++
      payloadCols.map(q) :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keys.map(q): _*)
      .orderBy(q(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(
      when(col("__side") === 0,
        struct((q(tsCol).as("__rts") +: payloadCols.map(q)): _*)),
      ignoreNulls = true).over(w)
    val fresh = q(tsCol) - carried.getField("__rts") <= tolerance
    lp.unionByName(rp)
      .select(keyTs ++ leftOnly.map(q) ++
        payloadCols.map(c =>
          when(fresh, carried.getField(c)).as(c)) :+
        col("__side"): _*)
      .where(col("__side") === 1)
      .drop("__side")
  }
}
