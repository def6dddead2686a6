package graft.validate

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class BalanceSpec extends AnyFunSuite with SparkSpec {

  private def gini(rows: Seq[(String, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    Balance.giniPpm(rows.toDF("d", "x"), col("d"), col("x"))
      .as[(Long, Long, Long)].collect().head
  }

  test("even mixture scores 0; maximal two-domain skew scores 0.5") {
    assert(gini(Seq(("a", 5L), ("b", 5L))) === ((2L, 10L, 0L)))
    assert(gini(Seq(("a", 0L), ("b", 10L))) === ((2L, 10L, 500000L)))
  }

  test("hand-computed intermediate value") {
    // [1, 3]: G = (2·7 − 3·4)/(2·4) = 2/8 = 0.25
    assert(gini(Seq(("a", 1L), ("b", 3L)))._3 === 250000L)
  }

  test("per-domain masses aggregate before ranking; ties stable") {
    // c = 2+2 = 4 collides with b = 4: tie order cannot change G
    val a = gini(Seq(("a", 8L), ("b", 4L), ("c", 2L), ("c", 2L)))
    val b = gini(Seq(("c", 4L), ("b", 4L), ("a", 8L)))
    assert(a === b)
    // [4,4,8]: six = 4+8+24 = 36; (2·36 − 4·16)/(3·16) = 8/48
    assert(a._3 === 166666L)
  }
}
