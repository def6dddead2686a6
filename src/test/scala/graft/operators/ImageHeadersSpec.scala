package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageHeaders, Multimodal}

/** Header-decode correctness on hand-crafted bytes of each published
  * format, plus an INDEPENDENT validation of [[ImageHeaders.tinyPng]]:
  * the JDK's ImageIO decoder (zlib + CRC checking) must accept the
  * generated PNG and agree on dimensions and pixel color — a chunk
  * CRC, deflate framing, or filter-byte bug would make ImageIO reject
  * it, not just mismatch. */
class ImageHeadersSpec extends AnyFunSuite {

  test("PNG IHDR width/height") {
    val png = ImageHeaders.tinyPng(640, 480, 0xffffff)
    assert(ImageHeaders.dimensions(png) === Some((640, 480)))
  }

  test("tinyPng is a VALID PNG per ImageIO, with the requested pixels") {
    val bytes = ImageHeaders.tinyPng(7, 5, 0x336699)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the generated PNG")
    assert(img.getWidth === 7 && img.getHeight === 5)
    assert((img.getRGB(0, 0) & 0xffffff) === 0x336699)
    assert((img.getRGB(6, 4) & 0xffffff) === 0x336699)
  }

  test("JPEG SOF0 frame dimensions, skipping earlier segments") {
    val jpeg = Array(
      0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, length 4
      0xff, 0xc0, 0x00, 0x0b, 0x08, // SOF0, length 11, precision 8
      0x01, 0x2c, // height 300
      0x01, 0x90, // width 400
      0x03).map(_.toByte)
    assert(ImageHeaders.dimensions(jpeg) === Some((400, 300)))
  }

  test("GIF logical screen descriptor (little-endian)") {
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x0a, 0x00, 0x05, 0x00, 0x00, 0x00))
    assert(ImageHeaders.dimensions(gif) === Some((10, 5)))
  }

  test("BMP header, including top-down negative height") {
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    val bb = java.nio.ByteBuffer.wrap(bmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 33)
    bb.putInt(22, -21) // top-down rows; pixel height is the magnitude
    assert(ImageHeaders.dimensions(bmp) === Some((33, 21)))
  }

  test("non-image bytes fall back to the deterministic fake decode") {
    val text = "hello world, definitely not an image".getBytes("UTF-8")
    assert(ImageHeaders.dimensions(text) === None)
    assert(Multimodal.decodeDims(text) === Multimodal.fakeDecode(text))
    assert(ImageHeaders.dimensions(Array.emptyByteArray) === None)
    // truncated PNG signature must not crash or match
    assert(ImageHeaders.dimensions(Array(0x89, 0x50).map(_.toByte)) === None)
  }

  test("decodePixels round-trips tinyPng (color lives only in IDAT)") {
    val png = ImageHeaders.tinyPng(7, 5, 0x30a070)
    val r = ImageHeaders.decodePixels(png).get
    assert((r.width, r.height, r.channels) === ((7, 5, 3)))
    assert(r.samples.grouped(3).forall(px =>
      px.sameElements(Array(0x30, 0xa0, 0x70))))
    assert(ImageHeaders.pixelMeans(r) === ((0x30L, 0xa0L, 0x70L)))
  }

  /** Build a PNG whose rows use the GIVEN filter types by applying
    * each filter forward to known pixels — decode must reverse all
    * five (spec: a/b/c are the reconstructed neighbors). */
  private def pngWithFilters(w: Int, h: Int,
                             px: (Int, Int, Int) => Int,
                             filters: Int => Int): Array[Byte] = {
    val stride = 3 * w
    val recon = Array.tabulate(h * stride) { i =>
      px(i % stride / 3, i / stride, i % 3)
    }
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = filters(y)
      raw(y * (1 + stride)) = ft.toByte
      for (i <- 0 until stride) {
        val x = recon(y * stride + i)
        val a = if (i >= 3) recon(y * stride + i - 3) else 0
        val b = if (y > 0) recon((y - 1) * stride + i) else 0
        val c = if (y > 0 && i >= 3) recon((y - 1) * stride + i - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b),
              math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (1 + stride) + 1 + i) = ((x - pred) & 0xff).toByte
      }
    }
    // wrap in signature + IHDR/IDAT/IEND (mirrors tinyPng's chunking)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(body.length).array())
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    val d = new java.util.zip.Deflater(9)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("decodePixels reverses Sub/Up/Average/Paeth filtered gradients") {
    def px(x: Int, y: Int, ch: Int): Int = (7 * x + 13 * y + 29 * ch) % 256
    val png = pngWithFilters(9, 6, px, y => Seq(0, 1, 2, 3, 4, 4)(y))
    val r = ImageHeaders.decodePixels(png).get
    for (y <- 0 until 6; x <- 0 until 9; ch <- 0 until 3)
      assert(r.samples(y * 27 + x * 3 + ch) === px(x, y, ch),
        s"pixel ($x,$y,$ch)")
  }

  test("decodePixels rejects what it cannot honestly decode") {
    // palette color type
    val pal = pngWithFilters(4, 4, (_, _, _) => 1, _ => 0)
    pal(25) = 3 // IHDR color type byte → palette
    assert(ImageHeaders.decodePixels(pal) === None)
    // truncated IDAT: drop the last 8 bytes
    val png = ImageHeaders.tinyPng(6, 6, 0x123456)
    assert(ImageHeaders.decodePixels(png.dropRight(20)) === None)
    assert(ImageHeaders.decodePixels("nope".getBytes) === None)
  }
}
