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
