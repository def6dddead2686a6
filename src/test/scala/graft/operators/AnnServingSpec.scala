package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.{Quantize, Similarity}

/** The two shortlist-then-rerank serving operators (Matryoshka
  * prefix funnel, binary-quantization hamming funnel) against their
  * exact degenerate cases: with the funnel widened to the whole
  * corpus the rerank IS brute force, so the outputs must be
  * row-identical — the invariant that pins both stages' tie-breaks
  * and score arithmetic to the gated brute-force contract. */
class AnnServingSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(n: Int, dims: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("truncatedRerankKnn with a full-corpus shortlist equals " +
      "brute force") {
    val e = vecs(40, 16, 7L)
    val q = e.where(col("vec_id") < 5)
    val got = Similarity.truncatedRerankKnn(e, q, "vec_id", "embedding",
        dPrefix = 4, candidates = 39, k = 3)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    val want = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 3)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    assert(got === want)
  }

  test("truncatedRerankKnn with dPrefix = dims shortlists exactly " +
      "like brute force at any width") {
    val e = vecs(30, 8, 11L)
    val q = e.where(col("vec_id") < 4)
    val got = Similarity.truncatedRerankKnn(e, q, "vec_id", "embedding",
        dPrefix = 8, candidates = 3, k = 3)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    val want = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 3)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    assert(got === want)
  }

  test("bqEncode packs sign bits into the documented words") {
    // dims 0, 2, 33 positive -> b0 = 2^0 + 2^2 = 5, b1 = 2^(33-32) = 2
    val v = Array.fill(64)(-1.0)
    v(0) = 0.5; v(2) = 1.0; v(33) = 2.0
    val got = Quantize.bqEncode(
        Seq((1L, v.toSeq)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dims = 64)
      .as[(Long, Long, Long)].collect().head
    assert(got === ((1L, 5L, 2L)))
    // zero is NOT positive: an all-zero vector packs to (0, 0)
    val z = Quantize.bqEncode(
        Seq((2L, Seq.fill(64)(0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dims = 64)
      .as[(Long, Long, Long)].collect().head
    assert(z === ((2L, 0L, 0L)))
  }

  test("bqRerankTopK with a full-corpus shortlist equals brute force") {
    val e = vecs(40, 64, 23L)
    val q = e.where(col("vec_id") < 5)
    val got = Quantize.bqRerankTopK(e, q, "vec_id", "embedding",
        dims = 64, candidates = 39, k = 3)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    val want = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 3)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    assert(got === want)
  }

  test("sq8AdcTopKByCell with one cell and full probes equals the " +
      "flat sq8AdcTopK scan") {
    // the IVF composition's degenerate case: every corpus vector in
    // cell 0 and every query probing cell 0 makes the cell-keyed
    // scan candidate-identical to the flat Q×N scan, so shortlist,
    // integer scores, and rerank must match row for row
    val e = vecs(40, 16, 31L)
    val q = e.where(col("vec_id") < 5)
    val corpus = e.withColumn("cell", lit(0))
    val probes = q.withColumn("cell", lit(0))
    val got = Quantize.sq8AdcTopKByCell(corpus, probes,
        "vec_id", "embedding", "cell",
        dims = 16, levels = 256, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Quantize.sq8AdcTopK(e, q, "vec_id", "embedding",
        dims = 16, levels = 256, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("sq8AdcTopKByCell restricts candidates to the probed cells") {
    // two planted cells; each query probes only its own cell, so no
    // cross-cell id may appear among its candidates even when the
    // shortlist is wide open
    val e = vecs(30, 8, 41L)
    val corpus = e.withColumn("cell",
      (col("vec_id") % 2).cast("int"))
    val probes = corpus.where(col("vec_id") < 4)
    val got = Quantize.sq8AdcTopKByCell(corpus, probes,
        "vec_id", "embedding", "cell",
        dims = 8, levels = 256, candidates = 29, k = 29)
    val crossCell = got.where(
      col("query_id") % 2 =!= col("nbr_id") % 2).count()
    assert(crossCell === 0L)
    // and within the probed cell the rerank is exact brute force
    val want = Similarity.bruteForceKnn(
        e.where(col("vec_id") % 2 === 0),
        e.where(col("vec_id") < 4 && col("vec_id") % 2 === 0),
        "vec_id", "embedding", k = 14)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    val gotEven = got.where(col("query_id") % 2 === 0)
      .select("query_id", "nbr_id", "score")
      .orderBy("query_id", "nbr_id").collect().toSeq
    assert(gotEven === want)
  }

  test("sq8EncodeAgainst clamps out-of-range values to the grid ends " +
      "and matches the in-range grid exactly") {
    // train the grid on rows whose dims span [0, 10]; the batch row
    // carries -5 and 25 -> codes 0 and 255
    val train = Seq((0L, Seq(0.0, 10.0)), (1L, Seq(10.0, 0.0)))
      .toDF("vec_id", "embedding")
    val arrs = Quantize.sq8RangeArrays(train, "vec_id", "embedding")
    val batch = Seq((2L, Seq(-5.0, 25.0)), (3L, Seq(5.0, 10.0)))
      .toDF("vec_id", "embedding")
    val got = Quantize.sq8EncodeAgainst(batch, "vec_id", "embedding",
        arrs, dims = 2, levels = 256)
      .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
    // in-range: floor(5/10*255+0.5)=128, floor(10/10*255+0.5)=255
    assert(got === Seq((2L, Seq(0L, 255L)), (3L, Seq(128L, 255L))))
  }

  test("sq8AdcTopKFromIndex over a fresh full-corpus index equals " +
      "the flat sq8AdcTopK scan") {
    val e = vecs(40, 16, 51L)
    val q = e.where(col("vec_id") < 5)
    val arrs = Quantize.sq8RangeArrays(e, "vec_id", "embedding")
    val codes = Quantize.sq8EncodeAgainst(e, "vec_id", "embedding",
      arrs, dims = 16, levels = 256)
    val got = Quantize.sq8AdcTopKFromIndex(codes, arrs, e, q,
        "vec_id", "embedding", dims = 16, levels = 256,
        candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Quantize.sq8AdcTopK(e, q, "vec_id", "embedding",
        dims = 16, levels = 256, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("bqRerankTopKFromCodes over a fresh full-corpus word table " +
      "equals bqRerankTopK") {
    val e = vecs(40, 64, 61L)
    val q = e.where(col("vec_id") < 5)
    val codes = Quantize.bqEncode(e, "vec_id", "embedding", dims = 64)
    val got = Quantize.bqRerankTopKFromCodes(codes, e, q,
        "vec_id", "embedding", dims = 64, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Quantize.bqRerankTopK(e, q, "vec_id", "embedding",
        dims = 64, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("bqRerankTopKByCell with one cell and full probes equals the " +
      "flat bqRerankTopK funnel") {
    val e = vecs(40, 64, 71L)
    val q = e.where(col("vec_id") < 5)
    val got = Quantize.bqRerankTopKByCell(e.withColumn("cell", lit(0)),
        q.withColumn("cell", lit(0)), "vec_id", "embedding", "cell",
        dims = 64, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Quantize.bqRerankTopK(e, q, "vec_id", "embedding",
        dims = 64, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("truncatedRerankKnnByCell with one cell and full probes equals " +
      "the flat truncated funnel") {
    val e = vecs(40, 16, 81L)
    val q = e.where(col("vec_id") < 5)
    val got = Similarity.truncatedRerankKnnByCell(
        e.withColumn("cell", lit(0)), q.withColumn("cell", lit(0)),
        "vec_id", "embedding", "cell", dPrefix = 4, candidates = 10,
        k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Similarity.truncatedRerankKnn(e, q, "vec_id", "embedding",
        dPrefix = 4, candidates = 10, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("the ByCell funnels restrict candidates to the probed cells") {
    val e = vecs(30, 16, 91L)
    val corpus = e.withColumn("cell", (col("vec_id") % 2).cast("int"))
    val probes = corpus.where(col("vec_id") < 4)
    val bq = Quantize.bqRerankTopKByCell(corpus, probes,
      "vec_id", "embedding", "cell", dims = 16, candidates = 29, k = 29)
    assert(bq.where(col("query_id") % 2 =!= col("nbr_id") % 2)
      .count() === 0L)
    val mrl = Similarity.truncatedRerankKnnByCell(corpus, probes,
      "vec_id", "embedding", "cell", dPrefix = 4, candidates = 29,
      k = 29)
    assert(mrl.where(col("query_id") % 2 =!= col("nbr_id") % 2)
      .count() === 0L)
  }

  test("bq hamming of a vector against its own negation is dims") {
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0 else -1.0)
    val e = Seq((1L, v.toSeq), (2L, v.map(-_).toSeq))
      .toDF("vec_id", "embedding")
    val got = Quantize.bqRerankTopK(e, e.where(col("vec_id") === 1),
        "vec_id", "embedding", dims = 64, candidates = 1, k = 1)
      .select("hamming").as[Long].collect().head
    assert(got === 64L)
  }
}
