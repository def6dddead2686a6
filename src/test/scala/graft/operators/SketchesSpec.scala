package graft.operators

import graft.SparkSpec
import graft.sketch.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv returns exact counts below k and bounded estimates above") {
    // key "small": 5 distinct values (< k=16) → exact 5.0
    // key "big": 5000 distinct values → estimate within 4 std errors
    val small = (1 to 5).map(i => ("small", s"s$i"))
    val big = (1 to 5000).map(i => ("big", s"b$i"))
    val df = (small ++ big).toDF("k", "v")
    val out = Sketches.kmvDistinctByKey(df, "k", "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("small") === 5.0)
    val se = 5000.0 / math.sqrt(16 - 2) // ~1336
    assert(math.abs(out("big") - 5000.0) < 4 * se,
      s"estimate ${out("big")} too far from 5000")
  }

  test("kmv is deterministic across runs and partitionings") {
    val df = (1 to 2000).map(i => ("k", s"v$i")).toDF("k", "v")
    val a = Sketches.kmvDistinctByKey(df, "k", "v", 32).collect().head.getDouble(1)
    val b = Sketches.kmvDistinctByKey(df.repartition(13), "k", "v", 32)
      .collect().head.getDouble(1)
    assert(a === b)
  }
}
