package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class RansCodecSpec extends AnyFunSuite {

  private def roundTrip(data: Array[Byte], order: Int): Unit = {
    val enc = RansCodec.compress(data, order)
    val dec = RansCodec.uncompress(enc)
    assert(dec.sameElements(data),
      s"order-$order round trip failed for ${data.length} bytes")
  }

  test("order-0 round trips: empty, single, uniform, skewed, all-same") {
    roundTrip(Array.emptyByteArray, 0)
    roundTrip(Array(42.toByte), 0)
    roundTrip(Array.fill(10000)(7.toByte), 0)
    val rnd = new Random(1)
    roundTrip(Array.fill(50000)(rnd.nextInt(256).toByte), 0)
    // skewed: DNA-like
    val dna = "ACGTN".getBytes
    roundTrip(Array.fill(30000)(dna(rnd.nextInt(5))), 0)
    // consecutive symbol runs exercise the table RLE
    roundTrip((0 until 20000).map(i => (i % 64).toByte).toArray, 0)
    // lengths not divisible by 4
    roundTrip(Array.fill(10001)(rnd.nextInt(256).toByte), 0)
    roundTrip(Array.fill(3)(rnd.nextInt(256).toByte), 0)
  }

  test("order-1 round trips: contextual, random, small, unaligned") {
    val rnd = new Random(2)
    roundTrip(Array.emptyByteArray, 1)
    roundTrip(Array(9.toByte), 1)
    roundTrip(Array.fill(4)(rnd.nextInt(256).toByte), 1)
    roundTrip(Array.fill(50000)(rnd.nextInt(256).toByte), 1)
    // strong order-1 structure: quality-string-like slow walk
    var q = 30
    val quals = Array.fill(40000) {
      q = math.max(0, math.min(60, q + rnd.nextInt(5) - 2)); (q + 33).toByte
    }
    roundTrip(quals, 1)
    roundTrip(quals.take(10001), 1)
    roundTrip(quals.take(7), 1)
  }

  test("order-1 beats order-0 on contextual data") {
    val rnd = new Random(3)
    var q = 30
    val quals = Array.fill(60000) {
      q = math.max(0, math.min(60, q + rnd.nextInt(3) - 1)); (q + 33).toByte
    }
    val o0 = RansCodec.compress(quals, 0).length
    val o1 = RansCodec.compress(quals, 1).length
    assert(o1 < o0, s"o1=$o1 should beat o0=$o0 on contextual data")
  }
}
