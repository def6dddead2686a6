package graft.multimodal

/** Pure-JVM AVI (RIFF) header parsing — the video sibling of
  * [[ImageHeaders]]/[[AudioHeaders]], completing the image/audio/video
  * metadata triple. Width, height, frame count and frame period come
  * straight from the published container layout (RIFF `LIST hdrl` →
  * `avih` MainAVIHeader, Microsoft AVI spec); cost is O(header bytes)
  * — the chunk walk never touches `movi` frame data, which is the
  * right trade for a metadata/filter/sample-planning pass over 100 TB
  * of video (frame decode stays behind the batch-encoder seam, like
  * audio waveforms).
  *
  * Reference analogue: content-type classification of unstructured
  * landing files (bp-unstructured-netapp-ingestion/ModuleFunctions.py:
  * 375-464) — there by extension, here by actual RIFF structure.
  */
object VideoHeaders {

  /** Decoded AVI metadata. All derived quantities are integer floor
    * division so any engine reproduces them exactly:
    * `durationMillis = frames·usPerFrame div 1000`,
    * `fpsX1000 = 10^9 div usPerFrame`. */
  final case class AviInfo(width: Int, height: Int, nFrames: Long,
                           microSecPerFrame: Long) {
    def durationMillis: Long = nFrames * microSecPerFrame / 1000L
    def fpsX1000: Long =
      if (microSecPerFrame <= 0) 0L else 1000000000L / microSecPerFrame
  }

  private def u8(x: Byte): Int = x & 0xff
  private def le32(b: Array[Byte], o: Int): Long =
    (u8(b(o)) | (u8(b(o + 1)) << 8) | (u8(b(o + 2)) << 16) |
      (u8(b(o + 3)).toLong << 24)) & 0xffffffffL
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    o + t.length <= b.length &&
      t.indices.forall(i => b(o + i) == t.charAt(i).toByte)

  /** Parse `RIFF..AVI LIST..hdrl avih` for the MainAVIHeader:
    * dwMicroSecPerFrame (+0), dwTotalFrames (+16), dwWidth (+32),
    * dwHeight (+36) relative to the avih payload. Tolerates extra
    * chunks before `hdrl` and extra `hdrl` members before `avih`;
    * returns None for non-AVI bytes or a malformed walk. */
  def aviInfo(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var off = 12
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4).toInt
      if (tag(b, off, "LIST") && tag(b, off + 8, "hdrl")) {
        // walk the list members for avih
        var in = off + 12
        val end = math.min(off + 8 + size, b.length)
        while (in + 8 <= end) {
          val s2 = le32(b, in + 4).toInt
          if (tag(b, in, "avih") && in + 8 + 40 <= b.length) {
            return Some(AviInfo(
              width = le32(b, in + 8 + 32).toInt,
              height = le32(b, in + 8 + 36).toInt,
              nFrames = le32(b, in + 8 + 16),
              microSecPerFrame = le32(b, in + 8)))
          }
          in += 8 + s2 + (s2 & 1)
        }
        return None // hdrl without avih is malformed
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** The frame-sampling plan every-`stride`-th frame: count and last
    * index, both integer floor arithmetic. The plan (not the frames)
    * is what a 100 TB pipeline shuffles — decode happens where the
    * bytes already live. */
  def sampledCount(nFrames: Long, stride: Int): Long =
    if (nFrames <= 0) 0L else (nFrames + stride - 1) / stride
  def lastSampledIndex(nFrames: Long, stride: Int): Long =
    if (nFrames <= 0) -1L else (nFrames - 1) / stride * stride

  /** A minimal, deterministic, VALID AVI header: RIFF(AVI ) holding
    * LIST(hdrl avih[56]) and an empty LIST(movi). Enough structure for
    * any spec-following parser to read the MainAVIHeader; no frame
    * payload (byte-stable everywhere). */
  def tinyAvi(width: Int, height: Int, nFrames: Int,
              microSecPerFrame: Int): Array[Byte] =
    tinyAviWithFrames(width, height, nFrames, microSecPerFrame, None)

  /** [[tinyAvi]] plus a REAL uncompressed video stream: the `movi`
    * list carries one `00db` chunk per frame holding the raw 24-bit
    * DIB pixel array (bottom-up rows, 4-byte row alignment, B,G,R
    * disk order — the uncompressed-AVI frame layout, same walk as a
    * BMP pixel array). `rgbAt(frame)(x, y)` supplies each pixel.
    * When `rgbAt` is None only the header is emitted (byte-stable,
    * the q_video_meta fixture). */
  def tinyAviWithFrames(width: Int, height: Int, nFrames: Int,
                        microSecPerFrame: Int,
                        rgbAt: Option[Int => (Int, Int) => Int]
                       ): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 0 && microSecPerFrame > 0,
      "tinyAvi needs positive parameters")
    val avihPayload = 56
    val hdrlList = 4 + 8 + avihPayload        // 'hdrl' + avih hdr + payload
    val rowSize = (3 * width + 3) / 4 * 4
    val frameBytes = rowSize * height
    val nChunks = if (rgbAt.isEmpty) 0 else nFrames
    // '00db' chunks: 8-byte header + payload (+1 pad if payload is odd
    // — rowSize is 4-aligned so payload is always even here)
    val moviList = 4 + nChunks * (8 + frameBytes)
    val riffPayload = 4 + 8 + hdrlList + 8 + moviList // 'AVI ' + lists
    val bb = java.nio.ByteBuffer.allocate(8 + riffPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffPayload)
      .put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(hdrlList)
      .put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(avihPayload)
      .putInt(microSecPerFrame)   // dwMicroSecPerFrame
      .putInt(0)                  // dwMaxBytesPerSec
      .putInt(0)                  // dwPaddingGranularity
      .putInt(0)                  // dwFlags
      .putInt(nFrames)            // dwTotalFrames
      .putInt(0)                  // dwInitialFrames
      .putInt(1)                  // dwStreams
      .putInt(0)                  // dwSuggestedBufferSize
      .putInt(width)              // dwWidth
      .putInt(height)             // dwHeight
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    bb.put("LIST".getBytes("US-ASCII")).putInt(moviList)
      .put("movi".getBytes("US-ASCII"))
    rgbAt.foreach { colorOf =>
      var f = 0
      while (f < nFrames) {
        val px = colorOf(f)
        bb.put("00db".getBytes("US-ASCII")).putInt(frameBytes)
        var y = height - 1 // bottom-up
        while (y >= 0) {
          var x = 0
          while (x < width) {
            val rgb = px(x, y)
            bb.put((rgb & 0xff).toByte)
              .put(((rgb >> 8) & 0xff).toByte)
              .put(((rgb >> 16) & 0xff).toByte)
            x += 1
          }
          var pad = rowSize - 3 * width
          while (pad > 0) { bb.put(0.toByte); pad -= 1 }
          y -= 1
        }
        f += 1
      }
    }
    bb.array()
  }

  /** REAL frame extraction for uncompressed AVIs: walk `LIST movi` for
    * `00db`/`01db` raw-DIB chunks and decode every `stride`-th one's
    * pixel array (shared [[ImageHeaders.decodeDib]] walk: bottom-up
    * 4-byte-aligned BGR rows at the avih dimensions). Returns
    * (frameIndex, raster) for the sampled frames; Nil for non-AVI
    * bytes, compressed streams, or malformed chunks — the quarantine
    * contract of every decoder here. This turns [[sampledCount]]'s
    * sampling PLAN into decoded frames where the bytes live. */
  def rawFrames(b: Array[Byte],
                stride: Int): Seq[(Long, ImageHeaders.Raster)] = {
    val info = aviInfo(b).getOrElse(return Nil)
    if (info.width <= 0 || info.height <= 0) return Nil
    val out = Seq.newBuilder[(Long, ImageHeaders.Raster)]
    var off = 12
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4).toInt
      if (tag(b, off, "LIST") && tag(b, off + 8, "movi")) {
        var in = off + 12
        val end = math.min(off + 8 + size, b.length)
        var idx = 0L
        while (in + 8 <= end) {
          val s2 = le32(b, in + 4).toInt
          if (s2 < 0 || in.toLong + 8 + s2 > end) return Nil // malformed
          // ..db = uncompressed DIB frame chunk of any stream number
          if (tag(b, in + 2, "db")) {
            if (idx % stride == 0)
              ImageHeaders.decodeDib(b, in + 8, info.width, info.height,
                  bpp = 24, topDown = false) match {
                case Some(r) => out += ((idx, r))
                case None => return Nil // lying chunk: quarantine whole file
              }
            idx += 1
          }
          in += 8 + s2 + (s2 & 1)
        }
        return out.result()
      }
      off += 8 + size + (size & 1)
    }
    Nil
  }
}
