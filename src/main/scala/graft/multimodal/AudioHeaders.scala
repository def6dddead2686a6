package graft.multimodal

/** Pure-JVM WAV (RIFF) header parsing — the audio sibling of
  * [[ImageHeaders]]: sample rate, channel count, bit depth, and frame
  * count straight from the published container layout (RIFF chunks,
  * Microsoft/IBM WAVE spec), no codec library. Cost is O(header
  * bytes): the chunk walk stops at `data` without touching samples —
  * the right trade for a metadata/filter pass over 100 TB of audio
  * (waveform decode stays behind the batch-encoder seam).
  *
  * Reference analogue: content-type classification of unstructured
  * landing files (bp-unstructured-netapp-ingestion/ModuleFunctions.py:
  * 375-464) — there by extension, here by actual RIFF structure.
  */
object AudioHeaders {

  /** Decoded WAV metadata. `durationMillis` uses integer floor
    * division (frames·1000 div rate) so any engine reproduces it
    * exactly. */
  final case class WavInfo(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nFrames: Long) {
    def durationMillis: Long =
      if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  private def u8(x: Byte): Int = x & 0xff
  private def le16(b: Array[Byte], o: Int): Int = u8(b(o)) | (u8(b(o + 1)) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (u8(b(o)) | (u8(b(o + 1)) << 8) | (u8(b(o + 2)) << 16) |
      (u8(b(o + 3)).toLong << 24)) & 0xffffffffL
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    t.indices.forall(i => b(o + i) == t.charAt(i).toByte)

  /** Parse a RIFF/WAVE header: walks chunks for `fmt ` (PCM layout)
    * and `data` (frame count = chunk size / block align). Tolerates
    * extra chunks (LIST, fact) in any order before `data`; returns
    * None for non-WAV bytes or a malformed chunk walk. */
  def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var off = 12
    var rate, ch, bits, blockAlign = 0
    var dataBytes = -1L
    while (off + 8 <= b.length && (dataBytes < 0 || rate == 0)) {
      val size = le32(b, off + 4)
      if (tag(b, off, "fmt ") && off + 8 + 16 <= b.length) {
        ch = le16(b, off + 10)
        rate = le32(b, off + 12).toInt
        blockAlign = le16(b, off + 20)
        bits = le16(b, off + 22)
      } else if (tag(b, off, "data")) dataBytes = size
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size.toInt + (size.toInt & 1)
    }
    if (rate <= 0 || ch <= 0 || blockAlign <= 0 || dataBytes < 0) None
    else Some(WavInfo(rate, ch, bits, dataBytes / blockAlign))
  }

  /** REAL PCM sample extraction: the `data` chunk of a 16-bit PCM WAV
    * decoded to interleaved signed samples — the waveform itself, not
    * just the header. Returns None for non-PCM/non-16-bit shapes,
    * truncated data chunks, or malformed walks (quarantine leg, like
    * every decoder here). Cost is O(data bytes) where the bytes
    * already live — the executor-side decode step of an audio
    * curation pass (silence gates, clipping detection, loudness
    * filters run on these samples). */
  def pcmSamples(b: Array[Byte]): Option[(WavInfo, Array[Int])] = {
    val info = wavInfo(b).getOrElse(return None)
    if (info.bitsPerSample != 16) return None
    val n = info.nFrames * info.channels
    if (n > (1L << 26)) return None // 64M samples ≈ 256 MB Ints: cap
    // find the data chunk again (wavInfo validated the walk)
    var off = 12
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4)
      if (tag(b, off, "data")) {
        if (off + 8 + n * 2 > b.length) return None // truncated
        val out = new Array[Int](n.toInt)
        var i = 0
        while (i < out.length) {
          // little-endian signed 16-bit
          out(i) = (le16(b, off + 8 + 2 * i) << 16) >> 16
          i += 1
        }
        return Some((info, out))
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Integer waveform statistics of decoded samples — every figure is
    * pure integer arithmetic so an independent engine replays it
    * exactly: peak = max |s|, meanAbs = Σ|s| div n, energy = Σs² div n
    * (the RMS² without the sqrt float hazard), zeroCrossings = count
    * of consecutive CHANNEL-0 frames whose signs differ (s >= 0 vs
    * s < 0). */
  def waveformStats(info: WavInfo,
                    samples: Array[Int]): (Long, Long, Long, Long) = {
    var peak = 0L
    var sumAbs = 0L
    var sumSq = 0L
    var crossings = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumAbs += a
      sumSq += s.toLong * s
      i += 1
    }
    var f = info.channels // channel 0 of frame 1
    while (f < samples.length) {
      if ((samples(f) >= 0) != (samples(f - info.channels) >= 0))
        crossings += 1
      f += info.channels
    }
    val n = math.max(1L, samples.length.toLong)
    (peak, sumAbs / n, sumSq / n, crossings)
  }

  /** A minimal, deterministic, VALID 16-bit PCM WAV: canonical 44-byte
    * header + a full-scale square wave of `periodFrames` half-period
    * (integer samples, no float rounding — byte-stable everywhere). */
  def tinyWav(sampleRate: Int, channels: Int, nFrames: Int,
              periodFrames: Int = 16): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0 && periodFrames > 0,
      "tinyWav needs positive parameters")
    val blockAlign = channels * 2
    val dataBytes = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var f = 0
    while (f < nFrames) {
      val v: Short = if ((f / periodFrames) % 2 == 0) 12000 else -12000
      var c = 0
      while (c < channels) { bb.putShort(v); c += 1 }
      f += 1
    }
    bb.array()
  }

  /** [[tinyWav]] with an arbitrary per-frame sample formula —
    * `sampleAt(frame, channel)` must fit a signed 16-bit value. The
    * waveform bytes are the payload, so decoding statistics from them
    * ([[pcmSamples]] + [[waveformStats]]) proves a real PCM walk. */
  def tinyWavPattern(sampleRate: Int, channels: Int, nFrames: Int,
                     sampleAt: (Int, Int) => Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0,
      "tinyWavPattern needs positive parameters")
    val blockAlign = channels * 2
    val dataBytes = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) { bb.putShort(sampleAt(f, c).toShort); c += 1 }
      f += 1
    }
    bb.array()
  }
}
