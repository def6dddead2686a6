package graft.operators

import graft.SparkSpec
import graft.graph.LabelProp

class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  /** Serial reference: synchronous LPA, argmax (count desc, label
    * asc), optional self-vote — the exact propagate contract. */
  private def brute(edges: Seq[(String, String)], iters: Int,
                    includeSelf: Boolean): Map[String, String] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val votes = edges.map { case (s, d) => d -> labels(s) } ++
        (if (includeSelf) labels.toSeq else Seq.empty)
      val grouped = votes.groupBy(_._1)
      labels = nodes.map { n =>
        grouped.get(n) match {
          case None => n -> labels(n)
          case Some(vs) =>
            val counts = vs.map(_._2).groupBy(identity)
              .map { case (l, o) => (l, o.size) }
            n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    labels
  }

  private def sym(pairs: (String, String)*): Seq[(String, String)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("two triangles joined by a bridge resolve to two communities") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val got = LabelProp.propagate(edges.toDF("src", "dst"), "src", "dst",
        iters = 3)
      .as[(String, String)].collect().toMap
    assert(got === brute(edges, 3, includeSelf = true))
    // the triangles must NOT merge into one label: the bridge is
    // outvoted by each triangle's internal majority
    assert(Set(got("a"), got("b"), got("c")).size === 1)
    assert(Set(got("x"), got("y"), got("z")).size === 1)
    assert(got("a") !== got("x"))
  }

  test("matches the serial reference on a bipartite star pair") {
    // two hubs sharing a leaf — the bipartite case self-vote damps
    val edges = sym(("h1", "l1"), ("h1", "l2"), ("h1", "s"),
      ("h2", "l3"), ("h2", "l4"), ("h2", "s"))
    for (iters <- 1 to 4) {
      val got = LabelProp.propagate(edges.toDF("src", "dst"), "src", "dst",
          iters = iters)
        .as[(String, String)].collect().toMap
      assert(got === brute(edges, iters, includeSelf = true), s"iters=$iters")
    }
  }

  test("includeSelf=false keeps a vote-less node's own label") {
    // directed edge a→b only: a never receives a vote
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = LabelProp.propagate(edges, "src", "dst", iters = 2,
        includeSelf = false)
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a", "b" -> "a"))
  }
}
