package graft.operators

import graft.SparkSpec
import graft.graph.Betweenness

/** Sampled betweenness vs a serial Brandes reference running the SAME
  * exact-ppm integer arithmetic (per-edge floor division, then sum),
  * plus the semantic corners: path-split dependency, hop-cap
  * truncation, pivot-endpoint exclusion, duplicate edges/pivots. */
class BetweennessSpec extends SparkSpec {

  import spark.implicits._

  /** Serial Brandes with hop cap and ppm floor arithmetic — the
    * sampledBetweenness contract, term for term. */
  private def serial(edges: Seq[(Long, Long)], pivots: Seq[Long],
                     maxHops: Int): Map[Long, Long] = {
    val eSet = edges.distinct
    val adj = eSet.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val acc = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (s <- pivots.distinct) {
      var dist = Map(s -> 0)
      var sig = Map(s -> 1L)
      var layers = Vector(Seq(s))
      var frontier = Seq(s)
      var h = 0
      while (frontier.nonEmpty && h < maxHops) {
        h += 1
        val candSig = scala.collection.mutable.Map[Long, Long]()
        for (v <- frontier; w <- adj.getOrElse(v, Seq.empty)
             if !dist.contains(w))
          candSig(w) = candSig.getOrElse(w, 0L) + sig(v)
        frontier = candSig.keys.toSeq
        dist ++= frontier.map(_ -> h)
        sig ++= candSig
        if (frontier.nonEmpty) layers :+= frontier
      }
      val delta = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for (l <- layers.size - 2 to 0 by -1; v <- layers(l)) {
        var d = 0L
        for (w <- adj.getOrElse(v, Seq.empty)
             if dist.get(w).contains(l + 1))
          d += (BigInt(sig(v)) * (1000000L + delta(w)) /
            BigInt(sig(w))).toLong
        delta(v) = d
      }
      for ((v, d) <- delta if v != s && d > 0) acc(v) += d
    }
    acc.filter(_._2 > 0).toMap
  }

  private def run(edges: Seq[(Long, Long)], pivots: Seq[Long],
                  maxHops: Int): Map[Long, Long] = {
    Betweenness.sampledBetweenness(edges.toDF("s", "d"), "s", "d",
        pivots.toDF("src"), "src", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a chain routes the full dependency through every inner node") {
    // a→b→c→d from pivot a: δ(c) = 10⁶, δ(b) = 2·10⁶, endpoints out
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(edges, Seq(1L), 3) === Map(2L -> 2000000L, 3L -> 1000000L))
  }

  test("a diamond splits dependency over the two shortest paths") {
    // a→b→d and a→c→d: σ(d) = 2, so b and c each get ⌊10⁶/2⌋
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(run(edges, Seq(1L), 2) === Map(2L -> 500000L, 3L -> 500000L))
  }

  test("the hop cap truncates dependency at the deepest layer") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    // cap 2: paths a→b→c only; c is an endpoint (δ = 0), b carries 10⁶
    assert(run(edges, Seq(1L), 2) === Map(2L -> 1000000L))
    assert(run(edges, Seq(1L), 2) === serial(edges, Seq(1L), 2))
  }

  test("pivot endpoints are excluded but pivots accumulate as brokers") {
    // two pivots a, c on a chain a→b→c→d: c brokers a's path to d
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = run(edges, Seq(1L, 3L), 3)
    assert(got === serial(edges, Seq(1L, 3L), 3))
    assert(got.contains(3L)) // c brokers for pivot a
    assert(!got.get(4L).exists(_ > 0L)) // d is only ever an endpoint
  }

  test("duplicate edges and duplicate pivots collapse") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L))
    assert(run(edges, Seq(1L, 1L), 3) === serial(edges, Seq(1L), 3))
  }

  test("matches serial Brandes on randomized digraphs") {
    val rnd = new scala.util.Random(2718)
    for (trial <- 1 to 5) {
      val n = 20
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val pivots = Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(n).toLong)
        .distinct
      val hops = 1 + rnd.nextInt(4)
      assert(run(edges, pivots, hops) === serial(edges, pivots, hops),
        s"trial $trial hops $hops pivots $pivots")
    }
  }

  test("matches serial Brandes on a symmetrized (undirected) graph") {
    val rnd = new scala.util.Random(626)
    val n = 15
    val base = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = base ++ base.map(_.swap)
    val pivots = Seq(1L, 7L, 11L)
    assert(run(edges, pivots, 4) === serial(edges, pivots, 4))
  }
}
