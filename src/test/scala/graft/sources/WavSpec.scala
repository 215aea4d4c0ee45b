package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WAV codec against hand-laid-out bytes from the public RIFF/WAVE spec
  * (not via the encoder, so an encoder/decoder bug pair can't cancel). */
class WavSpec extends AnyFunSuite {

  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
  private def le16(v: Int): Seq[Byte] = Seq(v, v >> 8).map(_.toByte)
  private def ascii(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  private def fmtChunk(channels: Int, rate: Int, bits: Int): Seq[Byte] = {
    val blockAlign = channels * bits / 8
    ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits)
  }

  test("hand-laid 16-bit mono decode, incl. an unknown chunk to skip") {
    val data = Seq(100, -100, 32767, -32768).flatMap(le16)
    // LIST chunk with ODD size: the walker must word-align past it
    val junk = ascii("LIST") ++ le32(3) ++ Seq[Byte](1, 2, 3, 0)
    val body = fmtChunk(1, 8000, 16) ++ junk ++
      ascii("data") ++ le32(data.length) ++ data
    val bytes = (ascii("RIFF") ++ le32(4 + body.length) ++ ascii("WAVE") ++
      body).toArray
    val a = Wav.decode(bytes)
    assert(a.sampleRateHz == 8000)
    assert(a.samples.toSeq == Seq(100, -100, 32767, -32768))
  }

  test("hand-laid 8-bit mono decode: unsigned, centered, full-scale mapped") {
    val data = Seq[Byte](128.toByte, 0, 255.toByte, 129.toByte)
    val body = fmtChunk(1, 44100, 8) ++ ascii("data") ++ le32(4) ++ data
    val bytes = (ascii("RIFF") ++ le32(4 + body.length) ++ ascii("WAVE") ++
      body).toArray
    val a = Wav.decode(bytes)
    // (b-128)*257: 128->0, 0->-32896/... wait spec: 0 -> -128*257 = -32896
    assert(a.samples.toSeq == Seq(0, -128 * 257, 127 * 257, 257))
  }

  test("hand-laid stereo 16-bit decode averages channels to mono") {
    // frames: (100, 200) -> 150; (-100, 100) -> 0; (7, 8) -> 7 (int mean)
    val data = Seq(100, 200, -100, 100, 7, 8).flatMap(le16)
    val body = fmtChunk(2, 16000, 16) ++ ascii("data") ++ le32(data.length) ++ data
    val bytes = (ascii("RIFF") ++ le32(4 + body.length) ++ ascii("WAVE") ++
      body).toArray
    assert(Wav.decode(bytes).samples.toSeq == Seq(150, 0, 7))
  }

  test("encode->decode round trip preserves samples exactly") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 255, 256, 1000)) {
      val smp = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val a = Wav.decode(Wav.encode(22050, smp))
      assert(a.sampleRateHz == 22050)
      assert(a.samples.toSeq == smp.toSeq, s"mismatch at n=$n")
    }
  }

  test("malformed payloads fail loudly") {
    assert(!Wav.isWav(null))
    assert(!Wav.isWav("RIFFxxxxXXXX".getBytes))
    intercept[IllegalArgumentException](Wav.decode("RIFF....WAVE".getBytes))
    // non-PCM format code
    val ok = Wav.encode(8000, Array(1, 2, 3))
    val bad = ok.clone(); bad(20) = 3 // IEEE float format
    intercept[IllegalArgumentException](Wav.decode(bad))
    // truncated data chunk
    intercept[IllegalArgumentException](Wav.decode(ok.take(ok.length - 2)))
  }
}
