package graft.operators

import graft.SparkSpec
import graft.streaming.EventStream

/** Two stateful AvailableNow streams starting CONCURRENTLY in one
  * parent session: each scopes its shuffle-partition count to a cloned
  * session (EventStream.streamSession), so neither can race the
  * other's conf — the round-8 ADVICE failure mode was a session-global
  * set/restore where stream B could plan under stream A's partition
  * count (or A's `finally` could restore mid-plan of B). The parent
  * session's batch conf must come out untouched. */
class ConcurrentStreamsSpec extends SparkSpec {

  test("two concurrent AvailableNow streams don't race shuffle-partition conf") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = spark.conf.get("spark.sql.shuffle.partitions")

    // distinct queryName per stream: memory-sink tables are global to
    // the shared catalog, so names must not collide across the clones
    val fQuantile = Future(EventStream.hourlyValueQuantilesAvailableNow(
      spark, sf, lo = 0L, binWidth = 100L, bins = 12,
      quantilesPermille = Seq(500, 990),
      queryName = "conc_quantile", statePartitions = 3))
    val fDistinct = Future(EventStream.hourlyDistinctUsersAvailableNow(
      spark, sf, k = 64, queryName = "conc_distinct",
      statePartitions = 5))

    val quantiles = Await.result(fQuantile, 10.minutes)
    val distinct = Await.result(fDistinct, 10.minutes)

    // both streams completed with sane output...
    assert(quantiles.count() > 0)
    assert(distinct.count() > 0)
    // ...matching their single-stream (sequential) results exactly
    val seqQuantiles = EventStream.hourlyValueQuantilesAvailableNow(
      spark, sf, lo = 0L, binWidth = 100L, bins = 12,
      quantilesPermille = Seq(500, 990),
      queryName = "seq_quantile", statePartitions = 3)
    val seqDistinct = EventStream.hourlyDistinctUsersAvailableNow(
      spark, sf, k = 64, queryName = "seq_distinct", statePartitions = 5)
    // collect-and-compare (tiny frames): the concurrent and sequential
    // results live on different session clones, so compare values, not
    // cross-session Dataset algebra
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(quantiles) === rows(seqQuantiles))
    assert(rows(distinct) === rows(seqDistinct))
    // and the parent session's batch conf was never touched
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }
}
