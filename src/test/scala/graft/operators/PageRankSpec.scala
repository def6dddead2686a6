package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.PageRank

class PageRankSpec extends AnyFunSuite with SparkSpec {

  test("one iteration matches hand-computed fixed-point values") {
    import spark.implicits._
    // path graph 1–2–3, undirected
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    // contribs: 1→2 full 1e6; 2 splits 5e5 each way; 3→2 full 1e6
    // p1(1) = 150000 + 850000·500000/1e6  = 575000
    // p1(2) = 150000 + 850000·2000000/1e6 = 1850000
    // p1(3) = 575000
    assert(got === Seq((1L, 575000L), (2L, 1850000L), (3L, 575000L)))
  }

  test("rank is deterministic across partitionings") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i % 40 + 1, i))).toDF("src", "dst")
    val a = PageRank.pageRank(edges.repartition(1), "src", "dst", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val b = PageRank.pageRank(edges.repartition(7), "src", "dst", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(a === b)
    // ring graph: symmetry ⇒ all ranks equal
    assert(a.map(_._2).distinct.size === 1)
  }

  test("a hub outranks leaves") {
    import spark.implicits._
    val star = (2L to 6L).flatMap(i => Seq((1L, i), (i, 1L)))
      .toDF("src", "dst")
    val pr = PageRank.pageRank(star, "src", "dst", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toMap
    assert(pr(1L) > pr(2L))
    assert((2L to 6L).map(pr).distinct.size === 1)
  }
}
