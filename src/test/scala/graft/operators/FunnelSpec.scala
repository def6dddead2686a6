package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FunnelSpec extends AnyFunSuite with SparkSpec {

  private def run(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    Funnel.funnel(rows.toDF("u", "tpe", "ts"), "u", "tpe", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSeq.sortBy(_._1)
  }

  test("steps must occur strictly after the previous step") {
    val got = run(Seq(
      // user 1: click BEFORE the first view → no click counted
      (1L, "click", 5L), (1L, "view", 10L),
      // user 2: full ordered chain; the pre-view click is ignored,
      // the later click (after view) is used
      (2L, "click", 1L), (2L, "view", 2L), (2L, "click", 3L),
      (2L, "purchase", 4L),
      // user 3: purchase before click → depth 2
      (3L, "view", 1L), (3L, "purchase", 2L), (3L, "click", 3L),
      // user 4: never viewed → excluded entirely
      (4L, "click", 1L), (4L, "purchase", 2L)))
    assert(got === Seq(
      (1L, Some(10L), None, None, 1),
      (2L, Some(2L), Some(3L), Some(4L), 3),
      (3L, Some(1L), Some(3L), None, 2)))
  }

  test("equal timestamps do NOT advance the funnel (strict >)") {
    val got = run(Seq((1L, "view", 5L), (1L, "click", 5L)))
    assert(got === Seq((1L, Some(5L), None, None, 1)))
  }
}
