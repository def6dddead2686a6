package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.Hits

/** Engine HITS == a serial Long-arithmetic reference on random
  * directed graphs — the L∞-normalized integer formulation is
  * bit-exact, so the comparison is equality, not tolerance. */
class HitsSpec extends SparkSpec {

  private def serialHits(edges: Set[(Long, Long)],
                         iters: Int): Map[Long, (Long, Long)] = {
    val S = Hits.Scale
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var hub = nodes.map(_ -> S).toMap
    var auth = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (n, s) => n -> s * S / mx }
    }
    for (_ <- 0 until iters) {
      auth = norm(nodes.map(v =>
        v -> edges.filter(_._2 == v).toSeq.map(e => hub(e._1)).sum).toMap)
      hub = norm(nodes.map(v =>
        v -> edges.filter(_._1 == v).toSeq.map(e => auth(e._2)).sum).toMap)
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  test("random directed graph: engine equals the serial reference exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    val edges = (0 until 120)
      .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.toSet
    val got = Hits.hits(edges.toSeq.toDF("src", "dst"), "src", "dst",
        iters = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val want = serialHits(edges, iters = 3)
    assert(got === want)
    spark.catalog.clearCache()
  }

  test("bipartite graph: sources have auth 0, sinks have hub 0, " +
       "top scores pin at SCALE") {
    import spark.implicits._
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 103L))
    val got = Hits.hits(edges.toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(r => r._1 -> (r._2, r._3)).toMap
    Seq(1L, 2L, 3L).foreach(v => assert(byId(v)._2 === 0L, s"src $v auth"))
    Seq(101L, 102L, 103L).foreach(v =>
      assert(byId(v)._1 === 0L, s"sink $v hub"))
    assert(got.map(_._2).max === Hits.Scale)
    assert(got.map(_._3).max === Hits.Scale)
    spark.catalog.clearCache()
  }

  test("trajectory identity: resume(g, hits(g, i), j) = hits(g, i+j)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val edges = (0 until 90)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val saved = Hits.hits(edges, "src", "dst", iters = 2)
    val warm = Hits.hitsResume(edges, "src", "dst", saved, iters = 2)
      .orderBy("node_id").collect().toSeq
    val cold = Hits.hits(edges, "src", "dst", iters = 4)
      .orderBy("node_id").collect().toSeq
    assert(warm === cold)
    spark.catalog.clearCache()
  }

  test("resume seeds batch-new nodes at SCALE (cold init)") {
    import spark.implicits._
    val old = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val saved = Hits.hits(old, "src", "dst", iters = 2)
    // node 9 only exists in the grown graph — its hub seed must be
    // the uniform SCALE, i.e. the result equals resuming from the
    // saved vector explicitly extended with (9, SCALE)
    val grown = Seq((1L, 2L), (2L, 3L), (9L, 2L)).toDF("src", "dst")
    val warm = Hits.hitsResume(grown, "src", "dst", saved, iters = 1)
      .orderBy("node_id").collect().toSeq
    val extended = saved.select(col("node_id"), col("hub_ppm"))
      .unionByName(Seq((9L, Hits.Scale)).toDF("node_id", "hub_ppm"))
    val want = Hits.hitsResume(grown, "src", "dst",
        extended, iters = 1)
      .orderBy("node_id").collect().toSeq
    assert(warm === want)
    spark.catalog.clearCache()
  }

  test("resume fails loudly when the saved hub vector is all-zero on " +
      "the resumed edge set") {
    import spark.implicits._
    // every node of the resumed graph was a pure sink in the
    // artifact (hub 0), so the warm init carries no direction — the
    // guard must throw instead of letting lInfNorm's max-0 division
    // NULL-propagate silently
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val saved = Seq((1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("node_id", "hub_ppm")
    val ex = intercept[IllegalArgumentException] {
      Hits.hitsResume(edges, "src", "dst", saved, iters = 1)
    }
    assert(ex.getMessage.contains("all-zero"))
    spark.catalog.clearCache()
  }
}
