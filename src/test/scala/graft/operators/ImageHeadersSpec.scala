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
}
