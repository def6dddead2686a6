package graft.validate

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TrendSpec extends AnyFunSuite with SparkSpec {

  private def slopes(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    Trend.slopeProfile(rows.toDF("g", "t", "v"),
        col("g"), col("t"), col("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
  }

  test("exact slope of a clean linear series") {
    // v = 2·seconds → 20000 y4-units/s → 1 728 000 000 per day
    val got = slopes(Seq(("a", 0L, 0.0), ("a", 1000000L, 2.0),
      ("a", 2000000L, 4.0)))
    assert(got === Seq(("a", 3L, 1728000000L)))
  }

  test("negative and flat trends, truncation toward zero") {
    val got = slopes(Seq(
      ("down", 0L, 10.0), ("down", 1000000L, 9.0),
      ("down", 2000000L, 8.0),
      ("flat", 0L, 5.0), ("flat", 1000000L, 5.0),
      ("one", 42L, 7.0))) // single point: degenerate denominator
    assert(got === Seq(
      ("down", 3L, -864000000L), // −10000/s · 86400
      ("flat", 2L, 0L),
      ("one", 1L, 0L)))
  }

  test("per-group centering keeps large epochs exact") {
    // same series shifted by ~50 years of microseconds: slope equal
    val base = Seq(("a", 0L, 1.0), ("a", 3000000L, 4.0))
    val shifted = base.map { case (g, t, v) =>
      (g, t + 1600000000000000L, v) }
    assert(slopes(base) === slopes(shifted))
  }
}
