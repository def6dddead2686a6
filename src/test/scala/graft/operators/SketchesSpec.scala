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

  test("count-min estimates only ever overcount, exactly at large width") {
    // skewed stream: "hot" 500×, "warm" 50×, 200 singletons
    val items = (Seq.fill(500)("hot") ++ Seq.fill(50)("warm") ++
      (1 to 200).map(i => s"cold$i")).toDF("x")
    val exact = Map("hot" -> 500L, "warm" -> 50L)
    // tight width → collisions allowed, but never undercount
    val small = Sketches.countMinEstimates(items, "x", items, "x",
      depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(small(k) >= n, s"$k undercounted") }
    assert(small.size === 202)
    // wide sketch → no collisions among 202 items is overwhelmingly
    // likely per-row, and min-over-4-rows needs ALL rows to collide
    val wide = Sketches.countMinEstimates(items, "x", items, "x",
      depth = 4, width = 1 << 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(wide(k) === n) }
  }

  test("kmv is deterministic across runs and partitionings") {
    val df = (1 to 2000).map(i => ("k", s"v$i")).toDF("k", "v")
    val a = Sketches.kmvDistinctByKey(df, "k", "v", 32).collect().head.getDouble(1)
    val b = Sketches.kmvDistinctByKey(df.repartition(13), "k", "v", 32)
      .collect().head.getDouble(1)
    assert(a === b)
  }

  test("bin-quantile sketch: error bounded by binWidth, splits merge") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(4000)(("g", rnd.nextInt(100000).toLong))
    val df = vals.toDF("k", "v")
    val est = Sketches.binQuantileEstimates(df, "k", "v",
        lo = 0L, binWidth = 1000L, bins = 100,
        quantilesPermille = Seq(500, 900, 990))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val sorted = vals.map(_._2).sorted
    Seq(500, 900, 990).foreach { q =>
      val exact = sorted((math.ceil(q / 1000.0 * sorted.size) - 1).toInt)
      assert(math.abs(est(q) - exact) <= 1000L,
        s"p$q est ${est(q)} vs exact $exact exceeds one bin width")
    }
    // mergeability: the sketch over the union equals the estimate
    // from ADDING the two halves' bin counts — same result as one
    // pass over everything (here via union, which is exactly cell
    // addition under groupBy)
    val (h1, h2) = vals.splitAt(2000)
    val merged = Sketches.binQuantileEstimates(
        h1.toDF("k", "v").unionAll(h2.toDF("k", "v")), "k", "v",
        0L, 1000L, 100, Seq(500, 900, 990))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(merged === est)
  }
}
