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
    * ImageIO — see [[encodePng]]. */
  def tinyPng(width: Int, height: Int, rgb: Int): Array[Byte] =
    encodePng(width, height, (_, _) => rgb)

  /** Deterministic PNG encoder for arbitrary pixel patterns: IHDR
    * (8-bit RGB), one IDAT holding the zlib-compressed filter-0
    * scanlines, IEND. `rgbAt(x, y)` supplies each pixel's 0xRRGGBB.
    * Deterministic across JVMs (fixed deflate level 9) so staged
    * fixtures are content-stable — the per-pixel colors exist ONLY
    * inside the compressed IDAT, which is what lets gradient fixtures
    * gate a genuine decode in [[decodePixels]]. */
  def encodePng(width: Int, height: Int,
                rgbAt: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "encodePng needs positive dimensions")
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
    var y = 0
    while (y < height) {
      val base = y * (1 + 3 * width) // raw(base) = 0: filter type None
      var x = 0
      while (x < width) {
        val rgb = rgbAt(x, y)
        raw(base + 1 + 3 * x) = ((rgb >> 16) & 0xff).toByte
        raw(base + 2 + 3 * x) = ((rgb >> 8) & 0xff).toByte
        raw(base + 3 + 3 * x) = (rgb & 0xff).toByte
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
        // Long arithmetic: len near Int.MaxValue must not wrap the
        // bounds check into a "fits" verdict and crash idat.write
        if (len < 0 || pos.toLong + 12L + len > png.length) return None
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
      // cap the decoded size BEFORE allocating: an adversarial header
      // claiming ~2G pixels would otherwise overflow `h * (1 + stride)`
      // into NegativeArraySizeException (or OOM a 16 GB allocation).
      // 2^27 samples ≈ 128 MP RGBA — far above any curation fixture,
      // far below harm.
      if (w.toLong * h * channels + h > (1L << 27)) return None
      val stride = channels * w
      val raw = new Array[Byte](h * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        // n == 0 while unfinished covers BOTH truncated streams
        // (needsInput) and FDICT preset-dictionary streams
        // (needsDictionary, where needsInput stays false and the old
        // needsInput-only check spun forever)
        if (n == 0) return None
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
    } catch {
      // malformed untrusted blobs route to quarantine as None, never an
      // executor-killing throw: bad zlib bytes, chunk-length lies that
      // slip past the walk, or header/size inconsistencies
      case _: java.util.zip.DataFormatException => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** REAL BMP pixel decode: BITMAPFILEHEADER + BITMAPINFOHEADER walk,
    * then the uncompressed DIB pixel array — 24/32-bit BI_RGB only
    * (the overwhelmingly dominant uncompressed layout). Rows are
    * 4-byte aligned and stored bottom-up unless biHeight is negative
    * (top-down); samples are B,G,R(,A) order on disk and returned as
    * RGB in the [[Raster]] (alpha dropped — callers treat BMP as
    * opaque, matching every curation feature downstream). Returns None
    * for palette/compressed/16-bit shapes and malformed buffers. */
  def decodeBmp(b: Array[Byte]): Option[Raster] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    try {
      val dataOffset = le32(b, 10)
      val dibSize = le32(b, 14)
      if (dibSize < 40) return None // BITMAPCOREHEADER not supported
      val w = le32(b, 18)
      val hRaw = le32(b, 22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bpp = le16(b, 28)
      val compression = le32(b, 30)
      if (w <= 0 || h <= 0 || compression != 0 ||
        (bpp != 24 && bpp != 32)) return None
      decodeDib(b, dataOffset, w, h, bpp, topDown)
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Raw DIB pixel-array walk shared by [[decodeBmp]] and AVI `00db`
    * frame payloads ([[VideoHeaders.rawFrames]]): `h` rows of 4-byte-
    * aligned B,G,R(,A) samples, bottom-up unless `topDown`. */
  private[multimodal] def decodeDib(b: Array[Byte], dataOffset: Int,
                                    w: Int, h: Int, bpp: Int,
                                    topDown: Boolean): Option[Raster] = {
    try {
      if (w <= 0 || h <= 0 || (bpp != 24 && bpp != 32)) return None
      if (w.toLong * h * 3 > (1L << 27)) return None // same cap as PNG
      val inChannels = bpp / 8
      val rowSize = ((bpp.toLong * w + 31) / 32 * 4).toInt
      if (dataOffset < 0 ||
        dataOffset.toLong + rowSize.toLong * h > b.length) return None
      val out = new Array[Int](h * w * 3)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val rowBase = dataOffset + srcRow * rowSize
        var x = 0
        while (x < w) {
          val p = rowBase + x * inChannels
          val o = (y * w + x) * 3
          out(o) = u8(b(p + 2))     // R (disk order is B,G,R[,A])
          out(o + 1) = u8(b(p + 1)) // G
          out(o + 2) = u8(b(p))     // B
          x += 1
        }
        y += 1
      }
      Some(Raster(w, h, 3, out))
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** A minimal, deterministic, VALID 24-bit BI_RGB BMP for arbitrary
    * pixel patterns — bottom-up rows, 4-byte row padding, B,G,R disk
    * order — the uncompressed sibling of [[encodePng]] for staged
    * fixtures (here the pixel bytes are raw, so the decode gate is the
    * row-order/padding/channel-order walk rather than inflate). */
  def tinyBmp(width: Int, height: Int,
              rgbAt: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "tinyBmp needs positive dimensions")
    val rowSize = (3 * width + 3) / 4 * 4
    val dataSize = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize) // file size
      .putInt(0)             // reserved
      .putInt(54)            // pixel data offset
      .putInt(40)            // BITMAPINFOHEADER size
      .putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1)           // planes
      .putShort(24)          // bits per pixel
      .putInt(0)             // BI_RGB (uncompressed)
      .putInt(dataSize)
      .putInt(2835).putInt(2835) // 72 dpi
      .putInt(0).putInt(0)   // palette counts
    var y = height - 1 // bottom-up: last raster row first on disk
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val rgb = rgbAt(x, y)
        bb.put((rgb & 0xff).toByte)         // B
          .put(((rgb >> 8) & 0xff).toByte)  // G
          .put(((rgb >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = rowSize - 3 * width
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Unified pixel decode across the formats with a pure-JVM path:
    * PNG (inflate + unfilter), BMP (DIB walk), baseline grayscale
    * JPEG (entropy decode + IDCT, [[JpegGray.decode]]), or GIF (LZW,
    * [[GifPixels.decode]]). Other formats and malformed bytes → None
    * (quarantine leg). */
  def decodeImage(b: Array[Byte]): Option[Raster] =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8) JpegGray.decode(b)
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      GifPixels.decode(b)
    else decodePixels(b)

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

  /** 8×8 grid of integer block-mean lumas, row-major (index =
    * by*8 + bx) — the resize step of the classic average-hash. All
    * arithmetic is integer floor (luma = (r+g+b)/3, block mean =
    * sum/count) so any engine replays the exact values. Block
    * boundaries are `b*dim/8`; images narrower than 8 px clamp each
    * block to at least one pixel (neighboring blocks then share
    * pixels, still deterministic). */
  def blockLumas(r: Raster): Array[Int] = {
    val out = new Array[Int](64)
    var by = 0
    while (by < 8) {
      val y0 = by * r.height / 8
      val y1 = math.max(y0 + 1, (by + 1) * r.height / 8)
      var bx = 0
      while (bx < 8) {
        val x0 = bx * r.width / 8
        val x1 = math.max(x0 + 1, (bx + 1) * r.width / 8)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = (y * r.width + x) * r.channels
            sum += (r.samples(p) + r.samples(p + 1) + r.samples(p + 2)) / 3
            x += 1
          }
          y += 1
        }
        out(by * 8 + bx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        bx += 1
      }
      by += 1
    }
    out
  }

  /** Average-hash (aHash) of a decoded raster: 64 block lumas
    * ([[blockLumas]]), mean = floor(sum/64), bit (by*8+bx) set iff
    * that block's luma >= mean. Near-identical images differ in a few
    * bits; the Hamming-banded self-join over these signatures is the
    * image near-dup candidate generator ([[graft.dedup.Dedup
    * .hammingPairs]]). Integer end-to-end — oracle-replayable. */
  def aHash(r: Raster): Long = {
    val blocks = blockLumas(r)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += blocks(i); i += 1 }
    val mean = sum / 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if (blocks(i) >= mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Per-channel histogram counts: `bins` equal-width buckets per
    * channel (bucket = sample*bins/256), returned as
    * [r_0..r_{bins-1}, g_0.., b_0..] — the cheap content fingerprint
    * that complements the spatial aHash. */
  def channelHistogram(r: Raster, bins: Int): Array[Long] = {
    val out = new Array[Long](3 * bins)
    var i = 0
    while (i < r.samples.length) {
      out(r.samples(i) * bins / 256) += 1
      out(bins + r.samples(i + 1) * bins / 256) += 1
      out(2 * bins + r.samples(i + 2) * bins / 256) += 1
      i += r.channels
    }
    out
  }
}
