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

  /** m=16 HLL estimate over a set of member ids — the same exact
    * arithmetic as HyperBall.estimate. */
  private def hllEstimate(members: Set[String]): Long = {
    val regs = Array.fill(16)(0)
    members.foreach { v =>
      val h = hash64(v)
      val bucket = (h >>> 56).toInt // 60-bit hash: div 2^56 = top 4 bits
      val w = h % 72057594037927936L
      val rho = if (w == 0) 57 else 57 - java.lang.Long.toBinaryString(w).length
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sSum = regs.map(r => 1L << (57 - r)).sum
    val v0 = regs.count(_ == 0)
    val raw = (BigInt(172288) * (BigInt(1) << 57) / (BigInt(1000) * sSum)).toLong
    if (raw <= 40 && v0 > 0) math.round(16.0 * math.log(16.0 / v0))
    else raw
  }

  /** Exact ball B(v, r) over directed edges, then the HLL estimate. */
  private def serialNf(edges: Seq[(String, String)], maxRadius: Int)
      : Map[(String, Long), Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    nodes.flatMap { v =>
      var ball = Set(v)
      (0 to maxRadius).map { r =>
        val est = hllEstimate(ball)
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
