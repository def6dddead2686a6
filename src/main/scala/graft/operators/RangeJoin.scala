package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points p matched to intervals [lo, hi] with
  * lo <= p <= hi. Spark plans a bare inequality join as a
  * broadcast-nested-loop over every (point, interval) pair; this is
  * the bin-bucketed form: points hash into fixed-width bins, each
  * interval replicates to the bins it overlaps, and the join is an
  * EQUI-join on the bin id with the exact range predicate evaluated
  * only inside matching bins.
  *
  * Scale notes: shuffle key = bin id, so work distributes by value
  * range. `binSize` trades replication (wide intervals × small bins)
  * against bin selectivity (narrow bins prune more pairs); pick it
  * near the median interval width. Degenerate hot bins (all values
  * equal) inherit the usual skew remedies (salt the bin id).
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val pb = points.withColumn("__bin", floor(col(ptCol) / binSize))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binSize),
        floor(col(hiCol) / binSize))))
    pb.join(ib, Seq("__bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
