package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.KCore

class KCoreSpec extends AnyFunSuite with SparkSpec {

  test("round 0 is the degree; converged rounds give exact coreness") {
    import spark.implicits._
    // a 4-clique {1,2,3,4} with a pendant path 4–5–6: coreness is 3
    // on the clique, 1 on the path
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val deg = KCore.corenessHIndex(edges, "a", "b", rounds = 0)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(deg === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 4L),
      (5L, 2L), (6L, 1L)))
    val core = KCore.corenessHIndex(edges, "a", "b", rounds = 4)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
      (5L, 1L), (6L, 1L)))
  }

  test("values are non-increasing in rounds and partition-invariant") {
    import spark.implicits._
    // ring of 12 + chords — coreness 2 everywhere on the ring
    val ring = (1L to 12L).map(i => (i, i % 12 + 1))
    val edges = (ring ++ Seq((1L, 7L), (2L, 8L))).toDF("a", "b")
    val r1 = KCore.corenessHIndex(edges.repartition(1), "a", "b", 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val r3 = KCore.corenessHIndex(edges.repartition(7), "a", "b", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(r1.map(_._1) === r3.map(_._1))
    r1.zip(r3).foreach { case ((_, v1), (_, v3)) => assert(v3 <= v1) }
    // and the 1-round result itself is partition-invariant
    val r1b = KCore.corenessHIndex(edges.repartition(5), "a", "b", 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(r1 === r1b)
  }

  test("duplicate, reversed, and self-loop edges are canonicalized") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L))
      .toDF("a", "b")
    val got = KCore.corenessHIndex(edges, "a", "b", rounds = 2)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
