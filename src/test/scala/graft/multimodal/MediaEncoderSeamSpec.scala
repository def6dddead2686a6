package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaEncoder
import graft.similarity.Similarity

/** Round-9 verdict item 8: the pixels→vector encoder is a pluggable
  * seam — a swapped implementation flows through the same
  * binary-scan → decode → embed → brute-force-knn plan unchanged
  * (the q_knn_pixels shape), so a real vision model drops in outside
  * the sandbox without touching any Spark plumbing. */
class MediaEncoderSeamSpec extends SparkSpec {

  /** Deterministic non-default encoder: mean-luma in dim 0, width/
    * height signals after — orthogonal to BlockLuma's layout so the
    * two can never accidentally agree. */
  private object DimsEncoder extends MediaEncoder {
    def encode(px: ImageHeaders.Raster, dim: Int): Array[Double] = {
      var sum = 0L
      var i = 0
      while (i < px.samples.length) { sum += px.samples(i); i += 1 }
      Array.tabulate(dim) {
        case 0 => sum.toDouble / px.samples.length / 255.0
        case 1 => px.width / 64.0
        case 2 => px.height / 64.0
        case j => 1.0 / (j + 1)
      }
    }
  }

  private def fixtureMedia() = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seam").toString
    val imgs = (0 until 8).map { i =>
      (i.toLong, JpegGray.tinyJpegGray(16, 16,
        (bx, by) => (bx * 17 + by * 23 + i * 31) % 256))
    }.toDF("doc_id", "content")
    graft.sinks.Sinks.writeBinaryFiles(imgs, "doc_id", "content", dir, "jpg")
    Multimodal.mediaFromFiles(spark, dir,
      idFromPath = regexp_extract(col("path"), "(\\d+)\\.jpg$", 1)
        .cast("long"))
  }

  test("a swapped encoder flows through the knn plan unchanged") {
    val media = fixtureMedia()

    // same plan, two encoders
    def knn(enc: MediaEncoder) = {
      val emb = Multimodal.embedMedia(media, dim = 8, enc).persist()
      val out = Similarity.bruteForceKnn(emb, emb.where(col("id") < 2),
        "id", "embedding", k = 3)
        .orderBy(col("query_id"), col("rank"))
        .collect().map(r => (r.getAs[Long]("query_id"),
          r.getAs[Int]("rank"), r.getAs[Long]("nbr_id")))
      emb.unpersist()
      out
    }
    val a = knn(MediaEncoder.BlockLuma)
    val b = knn(DimsEncoder)
    // both produce full top-k result sets through the identical plan
    // (self is excluded by the operator, so neighbors are real)
    assert(a.length === 6 && b.length === 6) // 2 queries × k=3
    assert(a.forall(t => t._1 != t._3) && b.forall(t => t._1 != t._3))
    // and the embeddings genuinely differ (the seam swapped, the
    // plumbing didn't)
    val embA = Multimodal.embedMedia(media, dim = 8).collect()
      .map(r => r.getAs[Long]("id") ->
        r.getSeq[Double](r.fieldIndex("embedding")).toList).toMap
    val embB = Multimodal.embedMedia(media, dim = 8, DimsEncoder).collect()
      .map(r => r.getAs[Long]("id") ->
        r.getSeq[Double](r.fieldIndex("embedding")).toList).toMap
    assert(embA.keySet === embB.keySet)
    assert(embA.keys.forall(k => embA(k) != embB(k)))
    // DimsEncoder's declared layout actually reached the vectors
    assert(embB.values.forall(v => v(1) == 16 / 64.0 && v(2) == 16 / 64.0))
  }
}
