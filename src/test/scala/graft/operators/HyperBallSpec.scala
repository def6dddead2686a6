package graft.operators

import graft.SparkSpec
import graft.graph.HyperBall
import org.apache.spark.sql.functions._

/** HyperBall vs a serial reference that computes EXACT balls by BFS
  * and then applies the identical register/estimator arithmetic —
  * gating the whole pipeline (hashing, bucket split, max-merge,
  * estimate) bit for bit, plus the early-stop and directedness
  * semantics. */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  /** The house hash64: first 15 hex chars of md5 as a long. */
  private def hash64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** HLL estimate over a set of member ids — the same exact
    * arithmetic as HyperBall.estimate, parameterized on the register
    * count (α·1000 per Flajolet: 673/697/709 for m = 16/32/64). */
  private def hllEstimate(members: Set[String], m: Int = 16): Long = {
    val alpha1000 = Map(16 -> 673L, 32 -> 697L, 64 -> 709L)(m)
    val p = 31 - Integer.numberOfLeadingZeros(m)
    val maxRank = 61 - p
    val wMod = 1L << (60 - p)
    val regs = Array.fill(m)(0)
    members.foreach { v =>
      val h = hash64(v)
      val bucket = (h / wMod).toInt
      val w = h % wMod
      val rho =
        if (w == 0) maxRank
        else maxRank - java.lang.Long.toBinaryString(w).length
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sSum = regs.map(r => 1L << (maxRank - r)).sum
    val v0 = regs.count(_ == 0)
    val raw = (BigInt(alpha1000 * m * m) * (BigInt(1) << maxRank) /
      (BigInt(1000) * sSum)).toLong
    if (raw <= m * 5 / 2 && v0 > 0)
      math.round(m.toDouble * math.log(m.toDouble / v0))
    else raw
  }

  /** Exact ball B(v, r) over directed edges, then the HLL estimate. */
  private def serialNf(edges: Seq[(String, String)], maxRadius: Int,
                       m: Int = 16): Map[(String, Long), Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    nodes.flatMap { v =>
      var ball = Set(v)
      (0 to maxRadius).map { r =>
        val est = hllEstimate(ball, m)
        ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Seq.empty))
        (v, r.toLong) -> est
      }
    }.toMap
  }

  private def run(edges: Seq[(String, String)], maxRadius: Int)
      : Map[(String, Long), Long] =
    HyperBall.neighborhoodFunction(edges.toDF("s", "d"), "s", "d", maxRadius)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("matches the serial exact-ball + HLL reference, randomized") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val n = 22
      val edges = Seq.fill(55)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter { case (a, b) => a != b }.distinct
      val radius = 1 + rnd.nextInt(4)
      assert(run(edges, radius) === serialNf(edges, radius),
        s"trial $trial radius $radius")
    }
  }

  test("balls follow edge direction") {
    // a -> b: a's ball grows to {a, b}; b's stays {b}
    val edges = Seq(("a", "b"))
    val got = run(edges, 1)
    assert(got(("a", 1L)) === hllEstimate(Set("a", "b")))
    assert(got(("b", 1L)) === hllEstimate(Set("b")))
  }

  test("early convergence equals the full unroll past the diameter") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val full = run(chain, 12)
    val serial = serialNf(chain, 12)
    assert(full === serial)
    // the ball saturates at radius 3; every later radius repeats it
    (4 to 12).foreach { r =>
      assert(full(("a", r.toLong)) === full(("a", 3L)), s"radius $r")
    }
  }

  test("m = 64 matches the serial reference at production accuracy") {
    val rnd = new scala.util.Random(41)
    val n = 30
    val edges = Seq.fill(70)(
      (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      .filter { case (a, b) => a != b }.distinct
    val got = HyperBall
      .neighborhoodFunction(edges.toDF("s", "d"), "s", "d", 3, m = 64)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === serialNf(edges, 3, m = 64))
  }

  test("unsupported register count is rejected") {
    val e = intercept[IllegalArgumentException] {
      HyperBall.neighborhoodFunction(
        Seq(("a", "b")).toDF("s", "d"), "s", "d", 1, m = 24)
    }
    assert(e.getMessage.contains("m=24"))
  }

  /** Run the incremental repair from a saved registerTable over
    * `oldEdges` with `newEdges` arriving as the batch; compare to a
    * full recompute over the union. */
  private def incrEqualsFull(oldEdges: Seq[(String, String)],
                             newEdges: Seq[(String, String)],
                             maxRadius: Int, clue: String,
                             broadcastChangedMax: Long =
                               HyperBall.DefaultBroadcastChangedMax): Unit = {
    val saved = HyperBall.registerTable(
      oldEdges.toDF("s", "d"), "s", "d", maxRadius)
    val incr = HyperBall.neighborhoodFunctionIncremental(
        oldEdges.toDF("s", "d"), newEdges.toDF("s", "d"), "s", "d",
        saved, maxRadius, broadcastChangedMax = broadcastChangedMax)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(incr === serialNf((oldEdges ++ newEdges).distinct, maxRadius),
      clue)
  }

  test("incremental repair equals full recompute, randomized splits") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 4) {
      val n = 20
      val edges = Seq.fill(60)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter { case (a, b) => a != b }.distinct
      val (oldE, newE) = edges.partition(_ => rnd.nextInt(4) > 0)
      incrEqualsFull(oldE, newE, 1 + rnd.nextInt(3), s"trial $trial")
    }
  }

  test("incremental repair handles batch-introduced NEW nodes") {
    // z/w are unseen by the saved run; x bridges into the old chain
    val oldE = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val newE = Seq(("z", "a"), ("d", "w"), ("z", "w"))
    incrEqualsFull(oldE, newE, 3, "new-node batch")
  }

  test("incremental repair with an empty batch reproduces the saved run") {
    val oldE = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"))
    incrEqualsFull(oldE, Seq.empty, 3, "empty batch")
  }

  test("incremental repair with duplicate batch edges is a no-op repair") {
    // every batch edge already exists — the anti-join must drop them
    // and the output must equal the saved run exactly
    val oldE = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    incrEqualsFull(oldE, oldE.take(2), 3, "duplicate batch")
  }

  test("incremental repair with a graph-sized batch: shuffled anti-join path") {
    // a batch that perturbs (nearly) every node exceeds the broadcast
    // threshold in production; drive the shuffled-anti-join branch by
    // zeroing the seam and prove the result is path-independent
    val oldE = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val newE = Seq(("e", "a"), ("c", "a"), ("b", "e"), ("a", "d"))
    incrEqualsFull(oldE, newE, 3, "graph-sized batch, shuffled path",
      broadcastChangedMax = 0L)
  }

  test("incremental rejects a saved table with too few radii") {
    val saved = HyperBall.registerTable(
      Seq(("a", "b")).toDF("s", "d"), "s", "d", maxRadius = 1)
    val e = intercept[IllegalArgumentException] {
      HyperBall.neighborhoodFunctionIncremental(
        Seq(("a", "b")).toDF("s", "d"), Seq(("b", "c")).toDF("s", "d"),
        "s", "d", saved, maxRadius = 3)
    }
    assert(e.getMessage.contains("radii 0..1"))
  }

  test("nf from a saved register table is row-identical to a fresh " +
      "propagation (the shared-artifact serving contract)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("b", "d")).toDF("s", "d")
    val regs = HyperBall.registerTable(edges, "s", "d", maxRadius = 3)
    val fromRegs = HyperBall.neighborhoodFunctionFromRegisters(regs)
      .orderBy("node", "r").collect().toSeq
    val fresh = HyperBall.neighborhoodFunction(edges, "s", "d",
        maxRadius = 3)
      .orderBy("node", "r").collect().toSeq
    assert(fromRegs === fresh)
    // and the harmonic summary composes identically
    val gotSummary = HyperBall.harmonicFromNf(
        HyperBall.neighborhoodFunctionFromRegisters(regs))
      .orderBy("node_id").collect().toSeq
    val wantSummary = HyperBall.harmonicSummary(edges, "s", "d")
      .orderBy("node_id").collect().toSeq
    assert(gotSummary === wantSummary)
    spark.catalog.clearCache()
  }

  test("harmonic summary replays the ppm delta formula") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"))
    val nf = serialNf(edges, 3)
    val got = HyperBall.harmonicSummary(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    Seq("a", "b", "c").foreach { v =>
      val Seq(n0, n1, n2, n3) =
        (0 to 3).map(r => nf((v, r.toLong)))
      val harm = (n1 - n0) * 1000000L / 1 + (n2 - n1) * 1000000L / 2 +
        (n3 - n2) * 1000000L / 3
      assert(got(v) === ((n0, n1, n2, n3, harm)), s"node $v")
    }
  }
}
