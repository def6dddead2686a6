package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards the q_multimodal / q_media_knn oracle contract: those
  * oracles compare Spark's UTF-8 BYTE semantics (substring → binary
  * cast) against DuckDB's CHARACTER semantics (len/ascii), which
  * agree only while the first 64 chars of every document are ASCII.
  * If a fixture regeneration ever breaks that, this spec fails with a
  * readable message instead of the driver reporting an opaque hash
  * mismatch. */
class MultimodalContractSpec extends SparkSpec {

  test("documents fixture is ASCII in the first 64 chars (oracle byte/char parity)") {
    val docs = graft.Tables(spark, sf, "documents")
    val nonAscii = docs
      .where(length(substring(col("text"), 1, 64)) =!=
        octet_length(substring(col("text"), 1, 64).cast("binary")))
      .count()
    assert(nonAscii === 0L,
      "non-ASCII text in first 64 chars — q_multimodal/q_media_knn " +
        "oracles need encode() on both sides before this fixture works")
  }

  test("extractFeatures byte length equals char length under the contract") {
    val media = graft.multimodal.Multimodal.mediaFromDocuments(
      spark, graft.Tables(spark, sf, "documents"), takeBytes = 64)
    val feats = graft.multimodal.Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(
      graft.Tables(spark, sf, "documents")
        .select(col("doc_id").as("id"),
          length(substring(col("text"), 1, 64)).as("n_chars64")),
      Seq("id"))
    assert(joined.where(col("n_bytes") =!= col("n_chars64")).count() === 0L)
  }

  test("sniffModality detects each format from magic bytes, codegen-side") {
    import spark.implicits._
    import graft.multimodal.{AudioHeaders, ImageHeaders, Multimodal}
    val rows = Seq(
      "png" -> ImageHeaders.tinyPng(3, 2, 0xabcdef),
      "jpeg" -> Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00)
        .map(_.toByte),
      "gif" -> ("GIF89a".getBytes("US-ASCII") ++ Array[Byte](1, 0, 1, 0)),
      "wav" -> AudioHeaders.tinyWav(8000, 1, 4),
      "bmp" -> ("BM".getBytes("US-ASCII") ++ new Array[Byte](24)),
      "unknown" -> "plain ascii text".getBytes("UTF-8"))
    val got = rows.map(_._2).toDF("content")
      .select(Multimodal.sniffModality(col("content")).as("m"))
      .as[String].collect().toSeq
    assert(got === rows.map(_._1))
  }

  test("embedMedia: real pixel embedding for decodable content, stub for text") {
    import spark.implicits._
    import graft.multimodal.{ImageHeaders, Multimodal}
    val png = ImageHeaders.encodePng(8, 8,
      (x, y) => ((x * 30) << 16) | ((y * 30) << 8) | 128)
    val bmp = ImageHeaders.tinyBmp(8, 8,
      (x, y) => ((x * 30) << 16) | ((y * 30) << 8) | 128)
    val txt = "not an image at all, just bytes".getBytes("UTF-8")
    val ds = Seq(
      Multimodal.MediaRow(1L, "png", png),
      Multimodal.MediaRow(2L, "bmp", bmp),
      Multimodal.MediaRow(3L, "txt", txt)).toDS()
    val emb = Multimodal.embedMedia(ds, dim = 64)
      .as[(Long, Array[Double])].collect().toMap
    // PNG and BMP carry the SAME pixels → identical real embeddings
    assert(emb(1L).sameElements(emb(2L)))
    // block lumas of the 8×8 pattern: luma(x,y) = (30x + 30y + 128)/3
    val expect = Array.tabulate(64) { i =>
      ((30 * (i % 8) + 30 * (i / 8) + 128) / 3) / 255.0
    }
    assert(emb(1L).sameElements(expect))
    // undecodable bytes keep the checksum-stub contract (q_media_knn)
    assert(!emb(3L).sameElements(emb(1L)))
    assert(emb(3L).forall(v => v >= 0.0 && v <= 1.0))
  }

  test("imageSignatures drops undecodable rows and matches aHash") {
    import spark.implicits._
    import graft.multimodal.{ImageHeaders, Multimodal}
    val png = ImageHeaders.encodePng(8, 8,
      (x, _) => if (x < 4) 0x000000 else 0xffffff)
    val ds = Seq(
      Multimodal.MediaRow(7L, "png", png),
      Multimodal.MediaRow(8L, "txt", "nope".getBytes("UTF-8"))).toDS()
    val sig = Multimodal.imageSignatures(ds)
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(sig.map(_._1) === Seq(7L))
    assert(sig.head._4 ===
      ImageHeaders.aHash(ImageHeaders.decodePixels(png).get))
  }

  test("mediaFromFiles reads a binary tree with glob + modality from ext") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    java.nio.file.Files.write(dir.resolve("a.png"),
      Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.wav"),
      Array[Byte](9, 8))
    java.nio.file.Files.write(dir.resolve("skip.txt"),
      Array[Byte](0)) // filtered by the glob
    val media = graft.multimodal.Multimodal
      .mediaFromFiles(spark, dir.toString)
    val rows = media.collect()
    assert(rows.map(_.modality).sorted.toSeq === Seq("png", "wav"))
    assert(rows.map(_.content.length).sorted.toSeq === Seq(2, 4))
    assert(rows.map(_.id).distinct.length === 2) // stable unique ids
    // the whole downstream pipeline runs on real file bytes
    val feats = graft.multimodal.Multimodal.extractFeatures(media)
    assert(feats.count() === 2L)
  }
}
