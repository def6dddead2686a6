package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering and sorted-neighborhood blocking.
  *
  * A naive `row_number() OVER (ORDER BY …)` collapses the whole
  * dataset into ONE partition — the classic 100-TB cliff. This
  * computes the identical rank distributed:
  *
  *   1. `repartitionByRange` on the sort key (range exchange — each
  *      partition holds a contiguous key range),
  *   2. per-partition local row_number (window keyed by partition id —
  *      parallelism preserved),
  *   3. partition offsets from a partition-count aggregate (≤
  *      `partitions` rows — the only single-partition step), broadcast
  *      back.
  *
  * The output rank equals the single-partition `row_number` exactly
  * whenever the sort key is a total order (include a unique tiebreak
  * column); range boundaries only decide WHERE a row is ranked, never
  * its rank.
  *
  * Sorted-neighborhood blocking (Hernández & Stolfo, 1995) rides on
  * the rank: candidate record pairs are those within `window`
  * positions in sort order, generated as a banded equi-join on
  * `rank div window` (each right row probes its own and the previous
  * band) — never a non-equi range join.
  */
object GlobalRank {

  /** Add a BIGINT `rnCol` = global row_number by `sortCols` (must be
    * a total order for a deterministic result). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      rnCol: String = "rn",
                      partitions: Int = 32): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    require(partitions > 0, s"partitions must be positive: $partitions")
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__local_rn",
      row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
    // ≤ `partitions` rows: the cumulative-offset window is tiny
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, (col("__offset") + col("__local_rn")).cast("long"))
      .drop("__pid", "__local_rn", "__offset")
  }

  /** Candidate pairs within `window` positions of each other in
    * `sortCols` order: (id_a, id_b, gap) with id_a ranked before
    * id_b and 1 ≤ gap ≤ window. */
  def sortedNeighborhood(df: DataFrame, idCol: String,
                         sortCols: Seq[Column], window: Int,
                         partitions: Int = 32): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    val ranked = globalRowNumber(
      df.select(col(idCol).as("__id") +: sortCols: _*),
      sortCols :+ col("__id"), rnCol = "__rn", partitions = partitions)
    val a = ranked.select(col("__id").as("id_a"), col("__rn").as("rn_a"),
      expr(s"__rn div $window").as("band"))
    val b = ranked.select(col("__id").as("id_b"), col("__rn").as("rn_b"),
      explode(array(expr(s"__rn div $window"),
        expr(s"__rn div $window - 1"))).as("band"))
    a.join(b, Seq("band"))
      .where(col("rn_b") > col("rn_a") &&
        col("rn_b") - col("rn_a") <= window)
      .select(col("id_a"), col("id_b"),
        (col("rn_b") - col("rn_a")).cast("long").as("gap"))
  }
}
