package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.Agreement

class AgreementSpec extends AnyFunSuite with SparkSpec {

  private def kappaOf(rows: Seq[(String, String)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    Agreement.cohenKappaPpm(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].collect().head
  }

  test("perfect agreement gives kappa 1.0") {
    val got = kappaOf(Seq(("x", "x"), ("y", "y"), ("x", "x")))
    assert(got === ((3L, 3L, 1000000L, 555555L, 1000000L)))
    // pe = (2·2 + 1·1)/9 = 5/9 → 555555 ppm; kappa exact 1e6
  }

  test("textbook 2x2 example") {
    // Cohen's classic: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
        Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val (n, agree, po, pe, kappa) = kappaOf(rows)
    assert(n === 50L && agree === 35L)
    assert(po === 700000L) // 35/50
    // pe = (25·30 + 25·20)/2500 = 1250/2500 = 0.5
    assert(pe === 500000L)
    // kappa = (0.7−0.5)/(1−0.5) = 0.4
    assert(kappa === 400000L)
  }

  test("systematic disagreement gives negative kappa, floor-divided") {
    // raters always flip: po=0, pe=0.5 → kappa = −1.0
    val rows = Seq.fill(10)(("y", "n")) ++ Seq.fill(10)(("n", "y"))
    val (_, agree, po, pe, kappa) = kappaOf(rows)
    assert(agree === 0L && po === 0L && pe === 500000L)
    assert(kappa === -1000000L)
  }

  test("negative kappa truncates toward zero like the DuckDB //") {
    // po=1/3, pe computed from skewed margins → non-divisible negative
    // numerator exercises the signed-division convention (both engines
    // truncate toward zero; floorDiv would differ by one here)
    val rows = Seq(("y", "n"), ("n", "y"), ("n", "n"))
    val (n, agree, po, pe, kappa) = kappaOf(rows)
    assert(n === 3L && agree === 1L && po === 333333L)
    // margins: a: y=1,n=2; b: n=2,y=1 → pe = (1·1 + 2·2)/9 = 5/9
    assert(pe === 555555L)
    val num = (po - pe) * 1000000L
    val den = 1000000L - pe
    assert(kappa === num / den) // Scala Long / truncates toward zero
    assert(kappa === Math.floorDiv(num, den) + 1) // ≠ floor: pinned
    assert(kappa < 0)
  }

  test("null labels are excluded") {
    import spark.implicits._
    val df = Seq(Some("x") -> Some("x"), None -> Some("y"),
        Some("y") -> None)
      .toDF("a", "b")
    val got = Agreement.cohenKappaPpm(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._1 === 1L && got._2 === 1L)
  }
}
