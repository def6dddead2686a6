package graft.operators

import graft.SparkSpec
import graft.similarity.Quantize
import org.apache.spark.sql.functions.col

/** Product quantization: codebook slicing, encode assignment, and the
  * ADC integer-LUT scan — against serial references running the exact
  * same arithmetic (integer-component vectors keep every dot product
  * binary-exact, so the references are bit-deterministic). */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val m = 2
  private val dims = 4
  private val subDim = dims / m

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0
    else BigDecimal(dot / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def dotU(a: Seq[Double], b: Seq[Double]): Long =
    math.floor(a.zip(b).map { case (x, y) => x * y }.sum * 1000000 + 0.5)
      .toLong

  test("codebooks are the k lowest-id vectors' slices") {
    val corpus = Seq(
      (3L, Seq(1.0, 0.0, 0.0, 2.0)),
      (1L, Seq(0.0, 1.0, 3.0, 0.0)),
      (2L, Seq(2.0, 2.0, 0.0, 1.0)),
      (9L, Seq(5.0, 5.0, 5.0, 5.0))).toDF("id", "v")
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
      .as[(Int, Long, Seq[Double])].collect().toSet
    // codes 0/1 = vectors of ids 1/2 (the two lowest), sliced in half
    assert(cb === Set(
      (0, 0L, Seq(0.0, 1.0)), (1, 0L, Seq(3.0, 0.0)),
      (0, 1L, Seq(2.0, 2.0)), (1, 1L, Seq(0.0, 1.0))))
  }

  test("exact codeword concatenations encode to their own codes") {
    val corpus = Seq(
      (1L, Seq(0.0, 1.0, 3.0, 0.0)),
      (2L, Seq(2.0, 2.0, 0.0, 1.0)),
      // id 5 = sub 0 of id 2 ++ sub 1 of id 1
      (5L, Seq(2.0, 2.0, 3.0, 0.0))).toDF("id", "v")
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
    val codes = Quantize.pqEncode(corpus, "id", "v", cb, m, dims)
      .as[(Long, Int, Long)].collect().toSet
    assert(codes.contains((5L, 0, 1L)))
    assert(codes.contains((5L, 1, 0L)))
    // every (id, sub) appears exactly once
    assert(codes.size === 3 * m)
  }

  test("encode matches the serial argmax on randomized integer vectors") {
    val rnd = new scala.util.Random(77)
    val vecs = (1L to 20L).map(i =>
      i -> Seq.fill(dims)((rnd.nextInt(9) - 4).toDouble))
      .filter(_._2.exists(_ != 0.0))
    val corpus = vecs.toDF("id", "v")
    val k = 4
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k, dims)
    val got = Quantize.pqEncode(corpus, "id", "v", cb, m, dims)
      .as[(Long, Int, Long)].collect()
      .map { case (id, sub, code) => (id, sub) -> code }.toMap
    val seeds = vecs.sortBy(_._1).take(k).map(_._2)
    for ((id, v) <- vecs; s <- 0 until m) {
      val sv = v.slice(s * subDim, (s + 1) * subDim)
      val want = seeds.zipWithIndex
        .map { case (cw, c) =>
          (c.toLong, cosine(sv, cw.slice(s * subDim, (s + 1) * subDim))) }
        .minBy { case (c, sc) => (-sc, c) }._1
      assert(got((id, s)) === want, s"id=$id sub=$s")
    }
  }

  test("ADC equals the serial LUT-sum reference and ranks planted clusters") {
    // two directionally distinct groups (no zero subvectors — a zero
    // slice encodes to an arbitrary codeword and legitimately inflates
    // ADC scores, the classic PQ degenerate case): queries near group
    // A must rank A members first
    val a = Seq(4.0, 1.0, 1.0, 4.0)
    val b = Seq(1.0, 4.0, 4.0, 1.0)
    def jitter(v: Seq[Double], j: Double) = v.map(x => if (x != 0) x + j else x)
    val corpus = Seq(
      1L -> a, 2L -> b,
      3L -> jitter(a, 1.0), 4L -> jitter(a, 2.0),
      5L -> jitter(b, 1.0), 6L -> jitter(b, 2.0)).toDF("id", "v")
    val k = 2
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k, dims)
    val codes = Quantize.pqEncode(corpus, "id", "v", cb, m, dims)
      .as[(Long, Int, Long)].collect()
      .map { case (id, sub, code) => (id, sub) -> code }.toMap
    val queries = Seq(1L -> a).toDF("id", "v")
    val got = Quantize.pqAdcTopK(
        Quantize.pqEncode(corpus, "id", "v", cb, m, dims),
        queries, "id", "v", cb, m, dims, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .map { case (q, n, s, r) => (q, n) -> ((s, r)) }.toMap
    // serial: same codebooks (slices of ids 1, 2), same LUT arithmetic
    val seeds = Seq(a, b)
    def serialScore(q: Seq[Double], id: Long): Long =
      (0 until m).map { s =>
        val qs = q.slice(s * subDim, (s + 1) * subDim)
        val cw = seeds(codes((id, s)).toInt).slice(s * subDim, (s + 1) * subDim)
        dotU(qs, cw)
      }.sum
    for (n <- Seq(2L, 3L, 4L, 5L, 6L))
      assert(got((1L, n))._1 === serialScore(a, n), s"nbr=$n")
    // ranking: the A-cluster members (3, 4 — both encode to code 0)
    // outrank every B member for the A query
    val rankOf = got.collect { case ((_, n), (_, r)) => n -> r }.toMap
    assert(Seq(3L, 4L).map(rankOf).max < Seq(2L, 5L, 6L).map(rankOf).min)
  }

  test("cell-restricted ADC scans only the query's cell") {
    val a = Seq(4.0, 1.0, 1.0, 4.0)
    val b = Seq(1.0, 4.0, 4.0, 1.0)
    val corpus = Seq(1L -> a, 2L -> b,
      3L -> a.map(_ + 1), 4L -> b.map(_ + 1)).toDF("id", "v")
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
    // hand-assigned cells: odd ids cell 0, even ids cell 1
    val cells = Seq(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L)
      .toDF("id", "cell")
    val codes = Quantize.pqEncode(corpus, "id", "v", cb, m, dims)
      .join(cells, Seq("id"))
    val queries = Seq(1L -> a).toDF("id", "v").join(cells, Seq("id"))
    val got = Quantize.pqAdcTopKByCell(codes, queries, "id", "v", "cell",
        cb, m, dims, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // only id 3 shares query 1's cell (and the query itself is out)
    assert(got.map(_._2) === Seq(3L))
    // the restricted score equals the flat scan's for the same pair
    val flat = Quantize.pqAdcTopK(
        Quantize.pqEncode(corpus, "id", "v", cb, m, dims),
        Seq(1L -> a).toDF("id", "v"), "id", "v", cb, m, dims, k = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got.head._3 === flat(3L))
  }

  /** Serial Lloyd round with the exact pqCodebooksTrained arithmetic:
    * argmax round-6 cosine (ties lowest code), 2^-20 fixed-point
    * integer mean rounded to 6, dead codewords keep their centroid. */
  private def serialLloydRound(subs: Seq[(Long, Int, Seq[Double])],
                               cb: Map[(Int, Long), Seq[Double]])
      : Map[(Int, Long), Seq[Double]] = {
    val scale = 1L << 20
    val assigned = subs.map { case (_, sub, sv) =>
      val best = cb.keys.filter(_._1 == sub).toSeq
        .map { key => (cosine(sv, cb(key)), key._2) }
        .maxBy { case (s, code) => (s, -code) }._2
      (sub, best, sv)
    }
    cb.map { case ((sub, code), prev) =>
      val members = assigned.collect {
        case (s, c, sv) if s == sub && c == code => sv
      }
      val cw =
        if (members.isEmpty) prev
        else prev.indices.map { d =>
          val qsum = members.map(sv => math.floor(sv(d) * scale).toLong).sum
          BigDecimal(qsum.toDouble / (members.size * scale))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      (sub, code) -> cw
    }
  }

  test("trained codebooks match the serial fixed-point Lloyd reference") {
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 12L).map(id =>
      id -> Seq.fill(dims)(rnd.nextInt(9) - 4.0)).toDF("id", "v")
    val rows = corpus.as[(Long, Seq[Double])].collect().toSeq
    val subsSer = rows.flatMap { case (id, v) =>
      (0 until m).map(s => (id, s, v.slice(s * subDim, (s + 1) * subDim)))
    }
    var cbSer = rows.sortBy(_._1).take(2).zipWithIndex.flatMap {
      case ((_, v), code) => (0 until m).map(s =>
        (s, code.toLong) -> v.slice(s * subDim, (s + 1) * subDim))
    }.toMap
    for (_ <- 0 until 2) cbSer = serialLloydRound(subsSer, cbSer)
    val got = Quantize.pqCodebooksTrained(corpus, "id", "v", m, k = 2,
        dims = dims, iters = 2)
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === cbSer)
  }

  test("trained codebooks with zero iterations are the seed codebooks") {
    val corpus = Seq(
      (1L, Seq(0.0, 1.0, 3.0, 0.0)),
      (2L, Seq(2.0, 2.0, 0.0, 1.0)),
      (3L, Seq(1.0, 0.0, 0.0, 2.0))).toDF("id", "v")
    val seed = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
      .as[(Int, Long, Seq[Double])].collect().toSet
    val trained = Quantize.pqCodebooksTrained(corpus, "id", "v", m, k = 2,
        dims = dims, iters = 0)
      .as[(Int, Long, Seq[Double])].collect().toSet
    assert(trained === seed)
  }

  test("dead codewords keep their previous centroid across rounds") {
    // two identical far-out vectors dominate both codewords' seeds;
    // code 1's seed (id 2's slices) attracts nothing once code 0 wins
    // every argmax tie, so it must survive training unchanged
    val a = Seq(1.0, 1.0, 1.0, 1.0)
    val corpus = Seq(1L -> a, 2L -> a, 3L -> a).toDF("id", "v")
    val seed = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
      .as[(Int, Long, Seq[Double])].collect()
      .collect { case (sub, 1L, cw) => sub -> cw }.toMap
    val trained = Quantize.pqCodebooksTrained(corpus, "id", "v", m, k = 2,
        dims = dims, iters = 2)
      .as[(Int, Long, Seq[Double])].collect()
      .collect { case (sub, 1L, cw) => sub -> cw }.toMap
    assert(trained === seed)
  }

  test("multi-probe: a 2-cell query row set scans the cells' union") {
    val a = Seq(4.0, 1.0, 1.0, 4.0)
    val b = Seq(1.0, 4.0, 4.0, 1.0)
    val corpus = Seq(1L -> a, 2L -> b,
      3L -> a.map(_ + 1), 4L -> b.map(_ + 1)).toDF("id", "v")
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
    val cells = Seq(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L)
      .toDF("id", "cell")
    val codes = Quantize.pqEncode(corpus, "id", "v", cb, m, dims)
      .join(cells, Seq("id"))
    // query 1 probes BOTH cells: two (id, cell) rows, one vector
    val queries = Seq((1L, a, 0L), (1L, a, 1L)).toDF("id", "v", "cell")
    val got = Quantize.pqAdcTopKByCell(codes, queries, "id", "v", "cell",
        cb, m, dims, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // probing every cell = the flat scan, row for row (each candidate
    // lives in exactly one cell, so the union is disjoint)
    val flat = Quantize.pqAdcTopK(
        Quantize.pqEncode(corpus, "id", "v", cb, m, dims),
        Seq(1L -> a).toDF("id", "v"), "id", "v", cb, m, dims, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.toSet === flat.toSet)
    assert(got.map(_._2).toSet === Set(2L, 3L, 4L))
  }

  test("residuals subtract the cell centroid; zero residuals code to 0") {
    val c0 = Seq(1.0, 0.0, 0.0, 0.0)
    val c1 = Seq(0.0, 1.0, 0.0, 0.0)
    val centroids = Seq((0L, c0), (1L, c1)).toDF("cluster_id", "centroid")
    val corpus = Seq(
      1L -> c0, // exactly its centroid: residual = 0
      2L -> Seq(0.25, 1.5, -0.5, 2.0),
      3L -> Seq(2.0, 0.5, 1.0, -1.0)).toDF("id", "v")
    val cells = Seq(1L -> 0L, 2L -> 1L, 3L -> 0L).toDF("id", "cell")
    val res = Quantize.residuals(corpus, "id", "v", cells, centroids)
      .as[(Long, Long, Seq[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(res(1L) === Seq(0.0, 0.0, 0.0, 0.0))
    assert(res(2L) === Seq(0.25, 0.5, -0.5, 2.0))
    assert(res(3L) === Seq(1.0, 0.5, 1.0, -1.0))
    // PQ over the residual frame, seeds excluding the exact-centroid
    // vector (the q_pq_residual construction): the zero residual
    // scores every codeword at the same constant, so every subvector
    // tie-breaks to code 0 — the cross-engine degeneracy contract
    val resDf = Quantize.residuals(corpus, "id", "v", cells, centroids)
      .select(col("id"), col("rv"))
    val cb = Quantize.pqCodebooks(resDf.where(col("id") =!= 1L),
      "id", "rv", m, k = 2, dims = dims)
    val codes = Quantize.pqEncode(resDf, "id", "rv", cb, m, dims)
      .as[(Long, Int, Long)].collect().toSet
    assert(codes.filter(_._1 == 1L) === Set((1L, 0, 0L), (1L, 1, 0L)))
  }

  test("audit reports the worst subvector fit and the code checksum") {
    // id 5 concatenates exact codewords: every sub scores cosine 1.0;
    // id 9 is off-axis, so its worst subvector fit is < 1
    val corpus = Seq(
      (1L, Seq(0.0, 1.0, 3.0, 0.0)),
      (2L, Seq(2.0, 2.0, 0.0, 1.0)),
      (5L, Seq(2.0, 2.0, 3.0, 0.0)),
      (9L, Seq(5.0, 1.0, 1.0, 5.0))).toDF("id", "v")
    val cb = Quantize.pqCodebooks(corpus, "id", "v", m, k = 2, dims = dims)
    val got = Quantize.pqAuditStats(corpus, "id", "v", cb, m, dims)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // codes of id 5: sub0 -> code 1, sub1 -> code 0 (spec above) →
    // checksum 1·1 + 0·2 = 1; perfect fit on both subs
    assert(got(5L) === ((2L, 1L, 1.0)))
    assert(got(9L)._1 === 2L)
    assert(got(9L)._3 < 1.0)
    // every corpus vector is audited
    assert(got.keySet === Set(1L, 2L, 5L, 9L))
  }

  test("dims must divide into m subvectors") {
    val corpus = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val boom = intercept[IllegalArgumentException] {
      Quantize.pqCodebooks(corpus, "id", "v", m = 2, k = 1, dims = 3)
    }
    assert(boom.getMessage.contains("subvectors"))
  }
}
