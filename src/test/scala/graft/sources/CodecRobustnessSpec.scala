package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-input behavior of the CRAM 3.1 codecs: truncated or garbled
  * streams must FAIL (any exception) — never hang, never fabricate
  * plausible output silently. (Same contract the CRAM container tests pin
  * for count desyncs.) */
class CodecRobustnessSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(11)
  private val data = Array.fill[Byte](5000)(
    if (rnd.nextInt(10) < 8) 65 else rnd.nextInt(256).toByte)

  test("rANS Nx16: truncated streams throw") {
    val enc = RansNx16Codec.compress(data, RansNx16Codec.Order1)
    for (cut <- Seq(1, 2, enc.length / 2, enc.length - 1)) {
      intercept[Exception] {
        val out = RansNx16Codec.uncompress(enc.take(cut))
        // a short-but-parseable prefix must at least not round-trip
        assert(out.toSeq != data.toSeq); throw new RuntimeException("diverged")
      }
    }
  }

  test("arith: truncated stream decodes to wrong bytes or throws, never hangs") {
    val enc = ArithCodec.compress(data, ArithCodec.Order1)
    for (cut <- Seq(1, enc.length / 2)) {
      val r = scala.util.Try(ArithCodec.uncompress(enc.take(cut)))
      // range decoder zero-pads missing bytes: output may exist but must
      // NOT equal the input (the model diverges immediately)
      assert(r.isFailure || r.get.toSeq != data.toSeq)
    }
  }

  test("fqz: truncated stream fails or diverges") {
    val recs = (0 until 50).map(_ => Array.fill[Byte](80)(38))
    val enc = FqzCodec.compress(recs)
    val r = scala.util.Try(FqzCodec.uncompress(enc.take(enc.length / 3)))
    assert(r.isFailure || r.get.map(_.toSeq) != recs.map(_.toSeq))
  }

  test("name tok: garbled column stream throws") {
    val enc = NameTokCodec.compress(Seq("a1:2", "a1:3", "b9:9"))
    val garbled = enc.clone()
    // flip bytes in the middle of the compressed column payloads
    for (i <- enc.length / 2 until math.min(enc.length / 2 + 4, enc.length))
      garbled(i) = (garbled(i) ^ 0x5a).toByte
    val r = scala.util.Try(NameTokCodec.uncompress(garbled))
    assert(r.isFailure || r.get != Seq("a1:2", "a1:3", "b9:9"))
  }

}
