package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.classify.Evaluation

class EvaluationSpec extends AnyFunSuite with SparkSpec {

  private def metrics(rows: Seq[(String, String)]) = {
    import spark.implicits._
    Evaluation.classMetrics(rows.toDF("l", "p"), col("l"), col("p"))
      .orderBy("clazz")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
  }

  test("hand-computed two-class confusion") {
    // a: 3 true (2 hit, 1 → b); b: 2 true (1 hit, 1 → a)
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "a"))
    val got = metrics(rows)
    // a: n_true=3, n_pred=3, correct=2 → p = r = 666666
    // f1 = 2·666666²//1333332 = 666666
    assert(got === Seq(
      ("a", 3L, 3L, 2L, 666666L, 666666L, 666666L),
      ("b", 2L, 2L, 1L, 500000L, 500000L, 500000L)))
  }

  test("never-predicted and never-true classes get explicit zeros") {
    // c is true once but never predicted; d predicted once, never true
    val rows = Seq(("a", "a"), ("c", "a"), ("a", "d"))
    val got = metrics(rows)
    assert(got.find(_._1 == "c").get === (("c", 1L, 0L, 0L, 0L, 0L, 0L)))
    assert(got.find(_._1 == "d").get === (("d", 0L, 1L, 0L, 0L, 0L, 0L)))
    // a: true 2, pred 2, correct 1
    assert(got.find(_._1 == "a").get._5 === 500000L)
  }

  test("perfect classifier gives 10^6 across the board") {
    val rows = Seq(("x", "x"), ("y", "y"), ("y", "y"))
    assert(metrics(rows).forall(r =>
      r._5 == 1000000L && r._6 == 1000000L && r._7 == 1000000L))
  }
}
