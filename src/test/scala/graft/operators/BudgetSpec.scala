package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sample.Budget

class BudgetSpec extends AnyFunSuite with SparkSpec {

  test("allocation follows targets, caps at availability, reports shortfall") {
    import spark.implicits._
    // per-domain tokens: a=100, b=50, c=10; total=160, budget 50%=80
    val rows = Seq(("a", 60L), ("a", 40L), ("b", 50L), ("c", 10L))
      .toDF("d", "tk")
    val got = Budget.tokenBudgetAllocation(rows, col("d"), col("tk"),
        Seq("a" -> 500000L, "b" -> 300000L, "c" -> 200000L),
        budgetPpmOfTotal = 500000L)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // wants: a=40, b=24, c=16; c caps at 10 with shortfall 6
    assert(got === Seq(
      ("a", 100L, 500000L, 40L, 400000L, 0L),
      ("b", 50L, 300000L, 24L, 480000L, 0L),
      ("c", 10L, 200000L, 10L, 1000000L, 6L)))
  }

  test("domains without a target are dropped; zero-token domains too") {
    import spark.implicits._
    val rows = Seq(("a", 10L), ("x", 99L), ("z", 0L)).toDF("d", "tk")
    val got = Budget.tokenBudgetAllocation(rows, col("d"), col("tk"),
        Seq("a" -> 1000000L, "z" -> 500000L), 1000000L)
      .select("domain").as[String].collect().toSeq
    assert(got === Seq("a"))
  }

  test("waterfill redistributes budget freed by capped domains") {
    import spark.implicits._
    // tokens: a=100, b=100, c=10; targets equal thirds; budget 90
    // round 1 (absolute ppm, ≡ base API): each granted
    // 333333·90//10⁶ = 29; c caps at 10 → 29/29/10 = 68
    // round 2 (live-share): r = 90−68 = 22 over tw = 666666 →
    // a,b each +333333·22//666666 = 11 (exact) → 40/40/10 = 90
    val rows = Seq(("a", 100L), ("b", 100L), ("c", 10L)).toDF("d", "tk")
    val got = Budget.waterfillAllocation(rows, col("d"), col("tk"),
        Seq("a" -> 333333L, "b" -> 333333L, "c" -> 333333L),
        budgetPpmOfTotal = 428572L, // 210·428572//1e6 = 90
        rounds = 2)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4)) === Seq(("a", 40L), ("b", 40L),
      ("c", 10L)))
    // single-round base allocation would have stopped at 29/29/10
  }

  test("partial mixture: rounds-1 waterfill equals the base allocation") {
    import spark.implicits._
    // targets sum to 500000 ≠ 10⁶ — the round-9 ADVICE case: round 1
    // must normalize by 10⁶ (absolute ppm), not by the live target sum
    val rows = Seq(("a", 1000L), ("b", 1000L)).toDF("d", "tk")
    val tgts = Seq("a" -> 300000L, "b" -> 200000L)
    val fill = Budget.waterfillAllocation(rows, col("d"), col("tk"),
        tgts, 500000L, rounds = 1)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val base = Budget.tokenBudgetAllocation(rows, col("d"), col("tk"),
        tgts, 500000L)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // budget = 1000; a wants 300, b wants 200 — no caps
    assert(fill.map(r => (r._1, r._4)) === Seq(("a", 300L), ("b", 200L)))
    assert(fill.map(_._4) === base.map(_._4))
  }

  test("untargeted domains count toward the waterfill budget envelope") {
    import spark.implicits._
    // x has no target but its 100 tokens belong to the corpus total —
    // both APIs must size the budget from the PRE-target-join table
    val rows = Seq(("a", 100L), ("x", 100L)).toDF("d", "tk")
    val tgts = Seq("a" -> 1000000L)
    val fill = Budget.waterfillAllocation(rows, col("d"), col("tk"),
        tgts, 500000L, rounds = 2)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val base = Budget.tokenBudgetAllocation(rows, col("d"), col("tk"),
        tgts, 500000L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // total = 200 → budget = 100 (not 50): a is granted its full 100
    assert(fill === Seq(("a", 100L, 1000000L, 100L, 1000000L)))
    assert(base.map(r => (r._1, r._4)) === Seq(("a", 100L)))
  }

  test("waterfill with no capped domain equals the base allocation") {
    import spark.implicits._
    val rows = Seq(("a", 1000L), ("b", 1000L)).toDF("d", "tk")
    val fill = Budget.waterfillAllocation(rows, col("d"), col("tk"),
        Seq("a" -> 600000L, "b" -> 400000L), 500000L, rounds = 3)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val base = Budget.tokenBudgetAllocation(rows, col("d"), col("tk"),
        Seq("a" -> 600000L, "b" -> 400000L), 500000L)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(fill.map(_._4) === base.map(_._4))
  }

  test("full budget with matching mixture accepts everything") {
    import spark.implicits._
    val rows = Seq(("a", 75L), ("b", 25L)).toDF("d", "tk")
    val got = Budget.tokenBudgetAllocation(rows, col("d"), col("tk"),
        Seq("a" -> 750000L, "b" -> 250000L), 1000000L)
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._4) === Seq(75L, 25L)) // alloc = available
    assert(got.map(_._5) === Seq(1000000L, 1000000L))
    assert(got.map(_._6) === Seq(0L, 0L))
  }
}
