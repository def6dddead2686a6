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
}
