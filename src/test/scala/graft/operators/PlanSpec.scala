package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Physical-plan shape assertions: the optimizations the engine claims
  * (scan pushdown, broadcast dimension joins, codegen'd pair
  * verification, no accidental cross products) must be visible in the
  * executed plans, not just intended. */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_filters predicates reach the parquet scan") {
    val p = plan("q_filters")
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("In(l_returnflag"), p.take(500))
  }

  test("q_filters scan reads only referenced columns") {
    val p = plan("q_filters")
    // ReadSchema must not include unprojected wide columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"))
  }

  test("q_join_inner broadcasts the nation dimension") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
  }

  test("q_dedup_ngram verifies pairs with the codegen'd intersect") {
    assert(plan("q_dedup_ngram").contains("sorted_intersect_size"))
  }

  test("q1_agg aggregates partially before the shuffle (map-side combine)") {
    assert(plan("q1_agg").contains("partial_sum"))
  }

  test("q_asof_join is a windowed union, not an inequality join") {
    val p = plan("q_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_range_join equi-joins on the bin id, not a nested loop") {
    assert(!plan("q_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("no query plans a cartesian product") {
    // brute-force knn intentionally scores query x corpus, but via a
    // broadcast nested-loop join of the tiny query side — never a
    // shuffled cartesian product
    for ((name, fn) <- SparkEntry.queries) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }
}
