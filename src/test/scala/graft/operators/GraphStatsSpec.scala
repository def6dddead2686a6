package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.GraphStats

class GraphStatsSpec extends AnyFunSuite with SparkSpec {

  private def profile(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    GraphStats.degreeProfile(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
  }

  test("a star is perfectly disassortative (r = −1)") {
    val got = profile((2L to 5L).map(l => (1L, l)))
    assert(got === ((5L, 4L, 1L, 4L, -1000000L)))
  }

  test("a path of 4 nodes has r = −0.5, exact ppm") {
    // degrees 1,2,2,1: Newman's hand example family — num=−4, den=8
    val got = profile(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got === ((4L, 3L, 1L, 2L, -500000L)))
  }

  test("a regular graph reports 0 (degenerate denominator)") {
    // triangle: all degrees 2, denominator 0 by convention → 0
    val got = profile(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got === ((3L, 3L, 2L, 2L, 0L)))
  }

  test("duplicates, reversals, and self-loops are canonicalized") {
    val got = profile(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L),
      (2L, 3L)))
    // effective path 1–2–3: same as the 3-node path
    assert(got._1 === 3L && got._2 === 2L)
  }
}
