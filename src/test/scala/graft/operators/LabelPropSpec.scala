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

  test("periodic early stop equals the full unroll at every parity") {
    // bipartite 4-cycle without the self-vote damping: pure
    // synchronous LPA two-coloring oscillates with period 2 forever —
    // the every-2nd-round stop must detect the cycle and still land on
    // the state the iters-round unroll would (parity fix), odd and
    // even caps alike, well past where the stop fires
    val edges = sym(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    for (iters <- Seq(5, 6, 9, 10)) {
      val got = LabelProp.propagate(edges.toDF("src", "dst"), "src", "dst",
          iters = iters, includeSelf = false)
        .as[(String, String)].collect().toMap
      assert(got === brute(edges, iters, includeSelf = false), s"iters=$iters")
    }
  }

  test("fixpoint early stop equals the full unroll at a large cap") {
    // a triangle converges to one label in a round or two; a 12-round
    // cap exercises the checkpoint-vs-checkpoint stop and the
    // remaining-round parity handling on a true fixpoint
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"))
    for (iters <- Seq(11, 12)) {
      val got = LabelProp.propagate(edges.toDF("src", "dst"), "src", "dst",
          iters = iters)
        .as[(String, String)].collect().toMap
      assert(got === brute(edges, iters, includeSelf = true), s"iters=$iters")
    }
  }

  test("matches the serial reference on randomized graphs at 1..6 rounds") {
    val rnd = new scala.util.Random(1513)
    for (trial <- 1 to 4) {
      val n = 6 + rnd.nextInt(5)
      val pairs = (1 to (n * 2)).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter { case (a, b) => a != b }.distinct
      if (pairs.nonEmpty) {
        val edges = sym(pairs: _*)
        val includeSelf = trial % 2 == 0
        for (iters <- 1 to 6) {
          val got = LabelProp.propagate(edges.toDF("src", "dst"),
              "src", "dst", iters = iters, includeSelf = includeSelf)
            .as[(String, String)].collect().toMap
          assert(got === brute(edges, iters, includeSelf),
            s"trial=$trial iters=$iters includeSelf=$includeSelf")
        }
      }
    }
  }

  test("trajectory identity: resume(g, propagate(g, i), j) = " +
      "propagate(g, i+j)") {
    val rnd = new scala.util.Random(99)
    val pairs = (1 to 30).map { _ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}")
    }.filter { case (a, b) => a != b }.distinct
    val edges = sym(pairs: _*).toDF("src", "dst")
    for (includeSelf <- Seq(true, false)) {
      val saved = LabelProp.propagate(edges, "src", "dst", iters = 2,
        includeSelf = includeSelf)
      val warm = LabelProp.resume(edges, "src", "dst", saved, iters = 2,
          includeSelf = includeSelf)
        .orderBy("node_id").as[(String, String)].collect().toSeq
      val cold = LabelProp.propagate(edges, "src", "dst", iters = 4,
          includeSelf = includeSelf)
        .orderBy("node_id").as[(String, String)].collect().toSeq
      assert(warm === cold, s"includeSelf=$includeSelf")
    }
  }

  test("labelOf decoupling: long keys + string labels equals the " +
    "all-string run through the bijection") {
    import org.apache.spark.sql.functions._
    // the r19 q_communities split: keys long (2k / 2k+1), labels the
    // original "c<k>"/"s<k>" strings whose ORDER the tie-break needs —
    // must be row-identical to propagating on the strings directly
    val strEdges = Seq(("c1", "s2"), ("s2", "c1"), ("c1", "s12"),
      ("s12", "c1"), ("c3", "s2"), ("s2", "c3"), ("c11", "s12"),
      ("s12", "c11"), ("c2", "s3"), ("s3", "c2"))
    def toLong(id: String): Long = {
      val k = id.drop(1).toLong
      if (id.startsWith("c")) k * 2 else k * 2 + 1
    }
    for (iters <- Seq(1, 2, 3); self <- Seq(true, false)) {
      val want = LabelProp.propagate(strEdges.toDF("a", "b"), "a", "b",
          iters, includeSelf = self)
        .orderBy("node_id").as[(String, String)].collect().toSeq
      val longDf = strEdges.map { case (a, b) => (toLong(a), toLong(b)) }
        .toDF("a", "b")
      val labelOf = (c: org.apache.spark.sql.Column) =>
        when(c % 2 === 0, concat(lit("c"), shiftright(c, 1)))
          .otherwise(concat(lit("s"), shiftright(c, 1)))
      val got = LabelProp.propagate(longDf, "a", "b", iters,
          includeSelf = self, labelOf = labelOf)
        .select(labelOf(col("node_id")).as("node_id"), col("label"))
        .orderBy("node_id").as[(String, String)].collect().toSeq
      assert(got === want, s"iters=$iters includeSelf=$self")
    }
  }

  test("resume seeds batch-new nodes at their own id") {
    val old = sym(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val saved = LabelProp.propagate(old, "src", "dst", iters = 3)
    // grown graph adds an isolated-from-the-artifact pair (p, q):
    // their first warm round must behave exactly like a cold start's
    val grown = sym(("a", "b"), ("b", "c"), ("a", "c"), ("p", "q"))
      .toDF("src", "dst")
    val warm = LabelProp.resume(grown, "src", "dst", saved, iters = 2)
      .orderBy("node_id").as[(String, String)].collect().toMap
    assert(warm("p") === "p" && warm("q") === "p")
    // and the artifact's community is undisturbed
    assert(Seq("a", "b", "c").map(warm) === Seq("a", "a", "a"))
  }
}
