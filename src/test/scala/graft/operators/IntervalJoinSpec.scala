package graft.operators

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long, Long, Long)],
                    tile: Long): Set[(Long, Long, Long)] =
    IntervalJoin.overlapPairs(
        rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", tile)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("overlapPairs finds overlaps, inclusive bounds, per key") {
    val rows = Seq(
      (1L, 10L, 0L, 100L),   // overlaps 11 (touching endpoint) and 12
      (1L, 11L, 100L, 200L), // touches 10 at 100 exactly
      (1L, 12L, 50L, 60L),   // inside 10
      (1L, 13L, 300L, 400L), // disjoint from all
      (2L, 20L, 0L, 100L))   // other key: never pairs with key 1
    assert(pairs(rows, tile = 64L) ===
      Set((1L, 10L, 11L), (1L, 10L, 12L)))
  }

  test("a pair spanning many tiles is emitted exactly once") {
    // both intervals cover tiles 0..9 at tile=10 — the overlap region
    // touches every tile, but attribution to the overlap-start tile
    // keeps exactly one copy
    val rows = Seq((1L, 1L, 0L, 99L), (1L, 2L, 5L, 95L))
    val out = IntervalJoin.overlapPairs(
        rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", 10L)
      .collect()
    assert(out.length === 1)
  }

  test("malformed intervals (start > end) are dropped") {
    val rows = Seq((1L, 1L, 100L, 0L), (1L, 2L, 0L, 100L))
    assert(pairs(rows, tile = 10L) === Set.empty)
  }

  test("matches the naive quadratic join on random intervals") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map { id =>
      val k = rnd.nextInt(5).toLong
      val s = rnd.nextInt(1000).toLong
      (k, id, s, s + rnd.nextInt(80))
    }
    val naive = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2)).toSet
    // tile much smaller AND much larger than typical interval length
    assert(pairs(rows, tile = 16L) === naive)
    assert(pairs(rows, tile = 4096L) === naive)
  }

  test("plans an equi-join on (key, tile), not a nested loop") {
    val df = Seq((1L, 1L, 0L, 10L)).toDF("k", "id", "s", "e")
    val plan = IntervalJoin.overlapPairs(df, "k", "id", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
