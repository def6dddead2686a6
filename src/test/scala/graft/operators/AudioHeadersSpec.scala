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
}
