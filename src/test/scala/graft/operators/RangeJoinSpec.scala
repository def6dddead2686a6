package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin matches inclusive bounds across bin boundaries") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 27.0), (4L, 99.0))
      .toDF("pid", "v")
    // [5,10] spans bins 0-1 at binSize=10; [26,28] sits inside bin 2
    val iv = Seq((100L, 5.0, 10.0), (200L, 26.0, 28.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.rangeJoin(points, "v", iv, "lo", "hi", binSize = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both bounds inclusive; 99 matches nothing
    assert(out === Set((1L, 100L), (2L, 100L), (3L, 200L)))
  }

  test("rangeJoin plans an equi-join on the bin, not a nested loop") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val iv = Seq((100L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.rangeJoin(points, "v", iv, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
