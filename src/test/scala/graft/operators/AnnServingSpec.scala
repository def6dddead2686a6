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
