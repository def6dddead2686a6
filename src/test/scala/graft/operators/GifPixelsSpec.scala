package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{GifPixels, ImageHeaders}

/** GIF LZW decode validated three ways: exact round-trip of our
  * encoder's stream, ImageIO accepting our bytes and agreeing on every
  * pixel (a malformed LZW stream or block structure would make
  * ImageIO reject), and our decoder reading ImageIO's OWN encoder
  * output — a stream with real dictionary growth our clear-per-pixel
  * fixtures never produce, proving the KwKwK/width-growth paths. */
class GifPixelsSpec extends AnyFunSuite {

  private val pal = Array.tabulate(16)(i =>
    (((i * 37 + 11) % 256) << 16) | (((i * 59 + 3) % 256) << 8) |
      ((i * 83 + 7) % 256))

  test("tinyGif round-trips exactly (indices live only in the LZW stream)") {
    def idx(x: Int, y: Int): Int = (x * 3 + y * 5 + 2) % 16
    val gif = GifPixels.tinyGif(11, 7, pal, idx)
    val r = GifPixels.decode(gif).get
    assert((r.width, r.height, r.channels) === ((11, 7, 3)))
    for (y <- 0 until 7; x <- 0 until 11) {
      val want = pal(idx(x, y))
      val p = (y * 11 + x) * 3
      assert(r.samples(p) === ((want >> 16) & 0xff), s"R($x,$y)")
      assert(r.samples(p + 1) === ((want >> 8) & 0xff), s"G($x,$y)")
      assert(r.samples(p + 2) === (want & 0xff), s"B($x,$y)")
    }
    // unified dispatch + header parse both see the same file
    assert(ImageHeaders.decodeImage(gif).get.samples.sameElements(r.samples))
    assert(ImageHeaders.dimensions(gif) === Some((11, 7)))
  }

  test("ImageIO accepts tinyGif and agrees on every pixel") {
    def idx(x: Int, y: Int): Int = (x + 2 * y) % 16
    val gif = GifPixels.tinyGif(9, 8, pal, idx)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gif))
    assert(img != null, "ImageIO rejected the generated GIF")
    assert(img.getWidth === 9 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 9)
      assert((img.getRGB(x, y) & 0xffffff) === pal(idx(x, y)), s"($x,$y)")
  }

  test("decodes ImageIO-encoded GIFs (real dictionary growth)") {
    val w = 40; val h = 30
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // long runs + structure: ImageIO's LZW encoder will grow the
    // dictionary and emit multi-pixel codes (incl. KwKwK sequences)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x / 7 + y / 5) % 2 == 0) 0x336699 else 0xcc9933)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val gif = bos.toByteArray
    val ours = GifPixels.decode(gif)
    assert(ours.isDefined, "our decoder rejected an ImageIO GIF")
    val r = ours.get
    assert((r.width, r.height) === ((w, h)))
    // GIF is lossless: every pixel must match ImageIO's own read
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gif))
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val got = (r.samples(p) << 16) | (r.samples(p + 1) << 8) |
        r.samples(p + 2)
      assert(got === (ref.getRGB(x, y) & 0xffffff), s"($x,$y)")
    }
  }

  test("rejects what it cannot honestly decode") {
    val gif = GifPixels.tinyGif(6, 6, pal, (x, y) => (x + y) % 16)
    // truncated LZW data
    assert(GifPixels.decode(gif.dropRight(8)) === None)
    assert(GifPixels.decode("GIF8 nope".getBytes) === None)
    assert(GifPixels.decode("totally not a gif".getBytes) === None)
  }
}
