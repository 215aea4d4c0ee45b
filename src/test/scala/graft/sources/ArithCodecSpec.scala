package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import ArithCodec._

/** Adaptive-arithmetic round trips (gate = self-consistency; see codec
  * scaladoc). The non-stationary payloads are the ones the adaptive model
  * exists for. */
class ArithCodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4321)

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](0),
    "all-same" -> Array.fill[Byte](10000)(40),
    "text" -> ("quality strings drift along the tile " * 400).getBytes("UTF-8"),
    "drifting" -> Array.tabulate[Byte](30000)(i =>
      (33 + ((i / 3000) * 4 + rnd.nextInt(4)) % 40).toByte), // non-stationary
    "random" -> Array.fill[Byte](8192)(rnd.nextInt(256).toByte),
    "binary-runs" -> (0 until 100).flatMap(i =>
      Array.fill(i % 17 + 1)((i % 3).toByte)).toArray,
    "all-256" -> Array.tabulate[Byte](2560)(i => (i % 256).toByte),
    "tiny" -> Array[Byte](1, 2, 3, 2, 1))

  for (order <- Seq(0, Order1); (pname, data) <- payloads)
    test(s"round trip order-$order over $pname (${data.length} bytes)") {
      val enc = compress(data, order)
      val dec = uncompress(enc)
      assert(dec.toSeq == data.toSeq,
        s"first mismatch at ${dec.toSeq.zip(data.toSeq).indexWhere(p => p._1 != p._2)}")
    }

  test("adaptive model tracks non-stationary data better than static rANS") {
    val data = Array.tabulate[Byte](60000) { i =>
      val phase = i / 6000 // symbol distribution shifts every 6k bytes
      (33 + (phase * 7 + rnd.nextInt(3)) % 60).toByte
    }
    val arith = compress(data, Order1).length
    val rans = RansNx16Codec.compress(data, RansNx16Codec.Order1).length
    assert(arith < data.length / 2)
    // not asserted strictly smaller than rANS (order-1 static tables are
    // strong), but must be in the same class
    assert(arith < rans * 2, s"arith $arith vs rans $rans")
  }

  test("incompressible data falls back to CAT") {
    val data = Array.fill[Byte](4096)(rnd.nextInt(256).toByte)
    val enc = compress(data, 0)
    assert(enc.length <= data.length + 8)
    assert(uncompress(enc).toSeq == data.toSeq)
  }

  test("fuzz: 200 random payloads of random sizes round trip") {
    for (t <- 0 until 200) {
      val n = rnd.nextInt(3000)
      val alpha = 1 + rnd.nextInt(255)
      val data = Array.fill[Byte](n)(rnd.nextInt(alpha).toByte)
      val order = if (t % 2 == 0) 0 else Order1
      val dec = uncompress(compress(data, order))
      assert(dec.toSeq == data.toSeq, s"fuzz $t (n=$n alpha=$alpha order=$order)")
    }
  }
}
