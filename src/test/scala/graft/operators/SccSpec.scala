package graft.operators

import graft.SparkSpec
import graft.graph.Scc

/** Engine SCC == a serial transitive-closure reference — the
  * max-member scc_id is definitional, so equality is exact. */
class SccSpec extends SparkSpec {

  private def serialScc(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = edges.filter(e => e._1 != e._2)
    var reach = adj
    var changed = true
    while (changed) {
      val more = for ((a, b) <- reach; (c, d) <- adj if c == b) yield (a, d)
      val next = reach ++ more
      changed = next.size != reach.size
      reach = next
    }
    nodes.map { v =>
      val mutual = nodes.filter(u =>
        u != v && reach.contains((v, u)) && reach.contains((u, v)))
      v -> (mutual + v).max
    }.toMap
  }

  test("two cycles, a one-way bridge, and a self-loop singleton") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), // cycle {1,2,3}
      (4L, 5L), (5L, 4L),                         // cycle {4,5}
      (3L, 4L),                                   // one-way bridge
      (6L, 6L))                                   // self-loop singleton
    val got = Scc.scc(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 5L, 5L -> 5L, 6L -> 6L))
    spark.catalog.clearCache()
  }

  test("random digraph: engine equals the serial closure reference " +
       "on BOTH paths (distributed peels and the Tarjan endgame)") {
    import spark.implicits._
    val rnd = new scala.util.Random(37L)
    val edges = (0 until 70)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)).toSet
    val want = serialScc(edges)
    // default thresholds → the whole graph goes through the endgame
    val viaEndgame = Scc.scc(edges.toSeq.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaEndgame === want)
    // endgame disabled → pure distributed peel path
    val viaPeels = Scc.scc(edges.toSeq.toDF("src", "dst"), "src", "dst",
        finishNodes = 0L, finishEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaPeels === want)
    spark.catalog.clearCache()
  }
}
