package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Streaming EWMA == batch EWMA, bit-exact: the bounded per-user
  * state (last depth−1 scaled inputs) carried across time-sliced
  * micro-batches must reproduce the batch window operator exactly —
  * including at batch boundaries, where the look-back spans the
  * state handoff. */
class EwmaStreamSpec extends AnyFunSuite with SparkSpec {

  test("time-sliced stream reproduces the batch operator bit-exactly") {
    import spark.implicits._
    val streamed = graft.streaming.EventStream
      .ewmaStreamAvailableNow(spark, sf, depth = 4, batches = 3)
      .select(col("event_id"), col("ewma"))
      .as[(Long, Double)].collect().toMap
    val ev = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        graft.Tables.eventTsUs.as("t_us"), col("value"))
    val batch = TimeSeries
      .truncatedEwma(ev, col("user_id"), col("value"), depth = 4,
        col("t_us"), col("event_id"))
      .select(col("event_id"), col("ewma"))
      .as[(Long, Double)].collect().toMap
    assert(streamed.size === batch.size)
    // bit-exact equality, not tolerance: both sides are one IEEE
    // division away from the same exact integers
    batch.foreach { case (id, v) =>
      assert(streamed(id) === v, s"event $id")
    }
  }
}
