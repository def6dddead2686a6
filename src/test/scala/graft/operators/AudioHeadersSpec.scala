package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AudioHeaders

/** RIFF/WAVE parse correctness, with the JDK's own WAV reader
  * (`javax.sound.sampled`) as the INDEPENDENT validator of
  * [[AudioHeaders.tinyWav]] — a header-layout bug would make
  * AudioSystem reject the bytes or disagree on format, not just
  * round-trip our own parser's assumptions. */
class AudioHeadersSpec extends AnyFunSuite {

  test("tinyWav round-trips through wavInfo") {
    val b = AudioHeaders.tinyWav(sampleRate = 16000, channels = 2,
      nFrames = 1234)
    assert(AudioHeaders.wavInfo(b) ===
      Some(AudioHeaders.WavInfo(16000, 2, 16, 1234L)))
    assert(AudioHeaders.wavInfo(b).get.durationMillis === 77L) // floor
  }

  test("tinyWav is a VALID WAV per the JDK sound API") {
    val b = AudioHeaders.tinyWav(sampleRate = 8000, channels = 1,
      nFrames = 500)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    val fmt = in.getFormat
    assert(fmt.getSampleRate === 8000f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(in.getFrameLength === 500L)
  }

  test("chunk walk tolerates extra chunks before data") {
    // RIFF [LIST 4] [fmt 16] [junk 3 + pad] [data ...]
    val base = AudioHeaders.tinyWav(22050, 1, 10)
    val fmtChunk = java.util.Arrays.copyOfRange(base, 12, 12 + 24)
    val dataChunk = java.util.Arrays.copyOfRange(base, 36, base.length)
    val out = new java.io.ByteArrayOutputStream()
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(tag.getBytes("US-ASCII"))
      out.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(body.length).array())
      out.write(body)
      if (body.length % 2 == 1) out.write(0)
    }
    out.write("RIFF????WAVE".getBytes("US-ASCII")) // size field unchecked
    chunk("LIST", Array[Byte](1, 2, 3, 4))
    out.write(fmtChunk)
    chunk("junk", Array[Byte](9, 9, 9)) // odd size → pad byte
    out.write(dataChunk)
    assert(AudioHeaders.wavInfo(out.toByteArray) ===
      Some(AudioHeaders.WavInfo(22050, 1, 16, 10L)))
  }

  test("non-WAV and truncated bytes return None") {
    assert(AudioHeaders.wavInfo("not audio at all".getBytes) === None)
    assert(AudioHeaders.wavInfo(Array.emptyByteArray) === None)
    // RIFF but not WAVE (e.g. an AVI) must not parse
    val avi = AudioHeaders.tinyWav(8000, 1, 4)
    avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(AudioHeaders.wavInfo(avi) === None)
  }

  test("pcmSamples round-trips tinyWavPattern, validated by the JDK sound API") {
    def s(f: Int, c: Int): Int = ((f * 11 + c * 5) % 3001) - 1500
    val wav = AudioHeaders.tinyWavPattern(16000, 2, 50, s)
    val (info, got) = AudioHeaders.pcmSamples(wav).get
    assert((info.sampleRate, info.channels, info.nFrames) ===
      ((16000, 2, 50L)))
    for (f <- 0 until 50; c <- 0 until 2)
      assert(got(f * 2 + c) === s(f, c), s"frame $f ch $c")
    // independent read: javax.sound must agree on every byte of PCM
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val buf = ais.readAllBytes()
    assert(buf.length === 50 * 2 * 2)
    for (i <- got.indices) {
      val v = ((buf(2 * i + 1) << 8) | (buf(2 * i) & 0xff)).toShort.toInt
      assert(v === got(i), s"sample $i vs javax.sound")
    }
  }

  test("waveformStats integer statistics match a direct computation") {
    val samples = Array(100, -200, 300, 0, -1, 1, 32767, -32768)
    val info = AudioHeaders.WavInfo(8000, 1, 16, samples.length)
    val (peak, meanAbs, energy, cross) =
      AudioHeaders.waveformStats(info, samples)
    assert(peak === 32768L)
    assert(meanAbs === samples.map(v => math.abs(v.toLong)).sum / 8)
    assert(energy === samples.map(v => v.toLong * v).sum / 8)
    // sign flips (>=0 boundary): 100→-200, -200→300, 0→-1, -1→1,
    // 32767→-32768 = 5
    assert(cross === 5L)
    // stereo: crossings count channel 0 only
    val st = AudioHeaders.WavInfo(8000, 2, 16, 2)
    val (_, _, _, c2) = AudioHeaders.waveformStats(st,
      Array(10, -10, -10, 10)) // ch0: 10→-10 = 1 crossing
    assert(c2 === 1L)
    // non-16-bit and truncated data reject
    val wav = AudioHeaders.tinyWavPattern(8000, 1, 10, (f, _) => f)
    assert(AudioHeaders.pcmSamples(wav.dropRight(4)) === None)
  }
}
