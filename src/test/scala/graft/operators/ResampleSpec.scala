package graft.operators

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, seq, value) at bucketSize=10: key 1 observes in buckets
  // 0, 0 (tie), 3; key 2 only in bucket 5
  private val events = Seq(
    (1L, 3L, 1L, 10.0),
    (1L, 7L, 2L, 20.0),  // later ts in the same bucket wins
    (1L, 35L, 3L, 30.0),
    (2L, 55L, 4L, 40.0))
    .toDF("k", "ts", "seq", "v")

  private def run() = Resample.locfResample(events, Seq("k"), "ts",
      Seq("ts", "seq"), "v", bucketSize = 10L)
    .collect().map(r => (r.getLong(0), r.getLong(1)) ->
      Option(r.get(2)).map(_.asInstanceOf[Double])).toMap

  test("dense spine per key, last-in-bucket wins, gaps carry forward") {
    val out = run()
    assert(out.keySet === Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 5L)))
    assert(out((1L, 0L)) === Some(20.0)) // ts=7 beats ts=3
    assert(out((1L, 1L)) === Some(20.0)) // gap → carried
    assert(out((1L, 2L)) === Some(20.0))
    assert(out((1L, 3L)) === Some(30.0))
    assert(out((2L, 5L)) === Some(40.0)) // spine bounded per key
  }

  test("in-bucket ties on ts break on the order column") {
    val tied = Seq((1L, 5L, 1L, 1.0), (1L, 5L, 2L, 2.0))
      .toDF("k", "ts", "seq", "v")
    val out = Resample.locfResample(tied, Seq("k"), "ts",
        Seq("ts", "seq"), "v", 10L)
      .collect().map(r => r.getDouble(2))
    assert(out.toSeq === Seq(2.0))
  }

  test("the in-bucket winner comes from an aggregation, not a raw-event window") {
    val plan = Resample.locfResample(events, Seq("k"), "ts",
      Seq("ts", "seq"), "v", 10L).queryExecution.executedPlan.toString
    // exactly one Window (the LOCF carry over the spine); the
    // per-bucket selection must stay a partial-aggregating groupBy
    assert(plan.split("Window").length - 1 === 1)
  }
}
