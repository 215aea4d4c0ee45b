package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import RansNx16Codec._

/** rANS Nx16 round trips — every flag combination the writer emits, across
  * adversarial payload shapes (no external CRAM 3.1 fixtures exist in this
  * container, so self-consistency plus the CRAM block round trips are the
  * gate; see the codec scaladoc). */
class RansNx16Spec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](42),
    "all-same" -> Array.fill[Byte](10000)(7),
    "two-sym" -> Array.tabulate[Byte](5001)(i => if (i % 3 == 0) 1 else 0),
    "four-sym" -> Array.tabulate[Byte](4096)(i => (i % 4).toByte),
    "hex-sym" -> Array.tabulate[Byte](9973)(i => ((i * 7) % 16).toByte),
    "text" -> ("the quick brown fox jumps over the lazy dog " * 300)
      .getBytes("UTF-8"),
    "runs" -> (0 until 50).flatMap(i =>
      Array.fill((i % 13) + 1)((i % 5).toByte)).toArray,
    "random" -> Array.fill[Byte](8192)(rnd.nextInt(256).toByte),
    "skewed" -> Array.fill[Byte](20000)(
      if (rnd.nextInt(100) < 90) 65 else rnd.nextInt(256).toByte),
    "all-256" -> Array.tabulate[Byte](2560)(i => (i % 256).toByte),
    "tiny3" -> Array[Byte](1, 2, 3))

  private val flagSets: Seq[(String, Int)] = Seq(
    "o0" -> 0,
    "o1" -> Order1,
    "o0-x32" -> X32,
    "o1-x32" -> (Order1 | X32),
    "o0-rle" -> Rle,
    "o1-rle" -> (Order1 | Rle),
    "o0-pack" -> Pack,
    "o0-rle-pack" -> (Rle | Pack),
    "o0-stripe" -> StripeF,
    "o1-stripe" -> (Order1 | StripeF))

  for ((fname, flags) <- flagSets; (pname, data) <- payloads)
    test(s"round trip $fname over $pname (${data.length} bytes)") {
      val enc = compress(data, flags)
      val dec = uncompress(enc)
      assert(dec.toSeq == data.toSeq,
        s"mismatch at ${dec.toSeq.zip(data.toSeq).indexWhere(p => p._1 != p._2)}")
    }

  test("entropy coding actually compresses skewed data") {
    val data = Array.fill[Byte](20000)(
      if (rnd.nextInt(100) < 95) 65 else rnd.nextInt(4).toByte)
    val enc = compress(data, 0)
    assert(enc.length < data.length / 2,
      s"order-0 got ${enc.length} for ${data.length}")
  }

  test("order-1 beats order-0 on context-heavy data") {
    val data = ("ab" * 4000 + "cd" * 4000).getBytes("UTF-8")
    val o0 = compress(data, 0)
    val o1 = compress(data, Order1)
    assert(o1.length < o0.length)
  }

  test("incompressible data falls back to CAT framing") {
    val data = Array.fill[Byte](4096)(rnd.nextInt(256).toByte)
    val enc = compress(data, 0)
    // CAT flag set, payload stored raw: overhead is flags + uint7 size
    assert((enc(0) & Cat) != 0 || enc.length <= data.length + 8)
    assert(uncompress(enc).toSeq == data.toSeq)
  }

  test("uint7 varint round trips boundary values") {
    for (v <- Seq(0, 1, 127, 128, 16383, 16384, 1 << 21, Int.MaxValue)) {
      val out = new java.io.ByteArrayOutputStream()
      RansNx16Codec.writeUint7(out, v)
      val pos = Array(0)
      assert(RansNx16Codec.readUint7(out.toByteArray, pos) == v)
      assert(pos(0) == out.size())
    }
  }
}
