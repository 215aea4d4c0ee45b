package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** fqzcomp-style quality codec round trips + compression sanity on
  * realistic quality profiles. */
class FqzCodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(777)

  private def rt(records: Seq[Array[Byte]]): Unit = {
    val enc = FqzCodec.compress(records)
    val dec = FqzCodec.uncompress(enc)
    assert(dec.length == records.length)
    records.zip(dec).zipWithIndex.foreach { case ((want, got), i) =>
      assert(got.toSeq == want.toSeq, s"record $i")
    }
  }

  test("empty set, empty records, single byte") {
    rt(Seq.empty)
    rt(Seq(Array.emptyByteArray, Array[Byte](40), Array.emptyByteArray))
  }

  test("realistic drifting qualities round trip and compress hard") {
    // Illumina-like: high plateau, noisy 3' tail, correlated neighbors
    val records = (0 until 500).map { _ =>
      val len = 90 + rnd.nextInt(20)
      var q = 38
      Array.tabulate[Byte](len) { i =>
        q = math.max(2, math.min(41,
          q + (if (rnd.nextInt(10) == 0) -rnd.nextInt(6) else rnd.nextInt(3) - 1)
            - (if (i > len - 15) 1 else 0)))
        q.toByte
      }
    }
    val enc = FqzCodec.compress(records)
    rt(records)
    val raw = records.map(_.length).sum
    assert(enc.length < raw / 2, s"got ${enc.length} for $raw")
  }

  test("binned qualities (4 levels) approach their entropy") {
    val records = (0 until 300).map(_ =>
      Array.fill[Byte](100)(Seq(2, 12, 22, 37)(rnd.nextInt(4)).toByte))
    rt(records)
  }

  test("variable record lengths incl. zero-length mixed in") {
    val records = (0 until 100).map { i =>
      Array.fill[Byte](i % 7 * 13)((33 + (i % 40)).toByte)
    }
    rt(records)
  }

  test("record boundary resets context (first byte not polluted by prev record)") {
    // two alternating profiles; a shared rolling context would mispredict
    // every first byte — correctness is exact either way, this exercises it
    val a = Array.fill[Byte](50)(40)
    val b = Array.fill[Byte](50)(5)
    rt(Seq.fill(50)(Seq(a, b)).flatten)
  }

  test("random noise round trips (worst case, no CAT in this frame)") {
    rt((0 until 50).map(_ => Array.fill[Byte](200)(rnd.nextInt(64).toByte)))
  }
}
