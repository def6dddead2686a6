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

  test("decodePixels bails (no hang) on an FDICT preset-dictionary stream") {
    // zlib header 0x78 0x20: FDICT set, (CMF·256+FLG) % 31 == 0 valid —
    // inflate returns 0 with needsDictionary()=true, needsInput()=false,
    // which the old needsInput-only bail spun on forever
    val base = ImageHeaders.tinyPng(2, 2, 0xabcdef)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 8)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(body.length).array())
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT",
      Array(0x78, 0x20, 0x00, 0x00, 0x00, 0x01).map(_.toByte))
    chunk("IEND", Array.emptyByteArray)
    assert(ImageHeaders.decodePixels(out.toByteArray) === None)
  }

  test("decodePixels rejects hostile headers without allocating") {
    // dimensions whose product overflows/explodes must fail fast
    val png = ImageHeaders.tinyPng(2, 2, 0x112233)
    val bb = java.nio.ByteBuffer.wrap(png)
    bb.putInt(16, 0x7fff0000) // width ~2G
    bb.putInt(20, 0x7fff0000) // height ~2G
    assert(ImageHeaders.decodePixels(png) === None)
    // chunk length near Int.MaxValue must not wrap the bounds check
    val png2 = ImageHeaders.tinyPng(2, 2, 0x112233)
    java.nio.ByteBuffer.wrap(png2).putInt(8, Int.MaxValue - 4)
    assert(ImageHeaders.decodePixels(png2) === None)
  }

  test("decodeBmp round-trips tinyBmp: padding, bottom-up rows, BGR order") {
    def rgbAt(x: Int, y: Int): Int =
      (((x * 31 + 7) % 256) << 16) | (((y * 37 + 3) % 256) << 8) |
        ((x + y) % 256)
    // width 10 → row size 32 with 2 pad bytes; height 6
    val bmp = ImageHeaders.tinyBmp(10, 6, rgbAt)
    val r = ImageHeaders.decodeBmp(bmp).get
    assert((r.width, r.height, r.channels) === ((10, 6, 3)))
    for (y <- 0 until 6; x <- 0 until 10) {
      val p = (y * 10 + x) * 3
      val want = rgbAt(x, y)
      assert(r.samples(p) === ((want >> 16) & 0xff), s"R($x,$y)")
      assert(r.samples(p + 1) === ((want >> 8) & 0xff), s"G($x,$y)")
      assert(r.samples(p + 2) === (want & 0xff), s"B($x,$y)")
    }
    // independent validation: ImageIO agrees on every pixel
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO rejected the generated BMP")
    for (y <- 0 until 6; x <- 0 until 10)
      assert((img.getRGB(x, y) & 0xffffff) === rgbAt(x, y))
    // decodeImage dispatches to the BMP path on the magic bytes
    assert(ImageHeaders.decodeImage(bmp).get.samples
      .sameElements(r.samples))
  }

  test("decodeBmp handles top-down (negative height) rows") {
    val up = ImageHeaders.tinyBmp(3, 2, (x, y) => (x + 10 * y) * 0x010101)
    // flip to top-down: negate height AND reverse the stored row order
    val rowSize = (3 * 3 + 3) / 4 * 4
    val down = up.clone()
    java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -2)
    System.arraycopy(up, 54 + rowSize, down, 54, rowSize)
    System.arraycopy(up, 54, down, 54 + rowSize, rowSize)
    val a = ImageHeaders.decodeBmp(up).get.samples
    val b = ImageHeaders.decodeBmp(down).get.samples
    assert(a.sameElements(b))
  }

  test("decodeBmp rejects compressed/16-bit/truncated shapes") {
    val good = ImageHeaders.tinyBmp(4, 4, (_, _) => 0x123456)
    val comp = good.clone()
    java.nio.ByteBuffer.wrap(comp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(30, 1) // BI_RLE8
    assert(ImageHeaders.decodeBmp(comp) === None)
    val sixteen = good.clone()
    java.nio.ByteBuffer.wrap(sixteen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(28, 16)
    assert(ImageHeaders.decodeBmp(sixteen) === None)
    assert(ImageHeaders.decodeBmp(good.dropRight(10)) === None)
    assert(ImageHeaders.decodeBmp("BMnope".getBytes) === None)
  }

  test("blockLumas: integer block means on a 16×16 two-tone raster") {
    // left half luma 10, right half luma 250 → blocks are 2×2 patches
    val samples = new Array[Int](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      samples((y * 16 + x) * 3 + c) = if (x < 8) 10 else 250
    val r = ImageHeaders.Raster(16, 16, 3, samples)
    val blocks = ImageHeaders.blockLumas(r)
    for (by <- 0 until 8; bx <- 0 until 8)
      assert(blocks(by * 8 + bx) === (if (bx < 4) 10 else 250))
    // aHash: mean = (32·10 + 32·250)/64 = 130 → right half bits set
    val h = ImageHeaders.aHash(r)
    for (i <- 0 until 64)
      assert(((h >> i) & 1L) === (if (i % 8 >= 4) 1L else 0L), s"bit $i")
  }

  test("channelHistogram: 4-bin counts per channel") {
    // 2×2 RGB: reds 0,64,128,255 → bins 0,1,2,3 one each;
    // greens all 0 → bin0=4; blues all 255 → bin3=4
    val samples = Array(
      0, 0, 255, 64, 0, 255,
      128, 0, 255, 255, 0, 255)
    val h = ImageHeaders.channelHistogram(
      ImageHeaders.Raster(2, 2, 3, samples), bins = 4)
    assert(h.toSeq === Seq(1L, 1L, 1L, 1L, 4L, 0L, 0L, 0L, 0L, 0L, 0L, 4L))
  }

  test("aHash separates the gradient-fixture groups (near-dup contract)") {
    def grad(id: Long): ImageHeaders.Raster = {
      val g = (id / 4).toInt
      val png = ImageHeaders.encodePng(8, 8, (x, y) => {
        val v = (x * 29 + y * 13 + g * 59) % 240 +
          (if (y * 8 + x == (id % 64).toInt) 15 else 0)
        (v << 16) | (v << 8) | v
      })
      ImageHeaders.decodePixels(png).get
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // siblings (same base pattern, one perturbed pixel) stay within
    // Hamming 2; different groups are far apart
    assert(ham(ImageHeaders.aHash(grad(0)), ImageHeaders.aHash(grad(1))) <= 2)
    assert(ham(ImageHeaders.aHash(grad(4)), ImageHeaders.aHash(grad(6))) <= 2)
    assert(ham(ImageHeaders.aHash(grad(0)), ImageHeaders.aHash(grad(12))) > 8)
  }
}
