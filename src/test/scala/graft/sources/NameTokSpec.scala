package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Name-tokenizer round trips over realistic read-name shapes (gate is
  * self-consistency + the CRAM 3.1 RN-block round trip in CramIOSpec —
  * see NameTokCodec scaladoc). */
class NameTokSpec extends AnyFunSuite {

  private def rt(names: Seq[String]): Unit = {
    val enc = NameTokCodec.compress(names)
    assert(NameTokCodec.uncompress(enc) == names)
  }

  test("Illumina-style coordinates round trip and compress well") {
    val names = (0 until 2000).map(i =>
      s"HWI-ST1234:7:1101:${1000 + i}:${90000 + i * 3}")
    val enc = NameTokCodec.compress(names)
    assert(NameTokCodec.uncompress(enc) == names)
    val raw = names.map(_.length + 1).sum
    assert(enc.length < raw / 3, s"got ${enc.length} for $raw raw bytes")
  }

  test("SRA-style accessions with dotted indices") {
    rt((1 to 500).map(i => s"SRR1234567.$i"))
  }

  test("duplicates, ties, order preservation") {
    rt(Seq("a1", "a1", "a1", "b2", "a1", "b2", "b2"))
  }

  test("leading zeros survive (DIGITS0 path)") {
    rt(Seq("s007", "s008", "s010", "s0001", "x00", "x0"))
  }

  test("long digit runs (>9 digits fall back to literal)") {
    rt(Seq("r12345678901234567890", "r12345678901234567891", "r1"))
  }

  test("mixed separators, empty names, unicode-free punctuation") {
    rt(Seq("", "a-b_c:d/e", "a-b_c:d/f", "#!@", "", "tail"))
  }

  test("non-monotonic numbers (delta only fires on 0..255 increases)") {
    rt(Seq("n100", "n90", "n345", "n346", "n90"))
  }

  test("single name and empty set") {
    rt(Seq("only"))
    rt(Seq.empty)
  }

  test("token count changes between names") {
    rt(Seq("ab12", "ab12cd34", "ab", "ab12cd34ef56", "zz"))
  }

  test("byte-stream adapter matches the BYTE_ARRAY_STOP layout") {
    val names = Seq("q1:2:3", "q1:2:4", "q1:3:0")
    val data = names.flatMap(n => n.getBytes("UTF-8").toSeq :+ '\t'.toByte)
      .toArray
    val enc = NameTokCodec.compressByteStream(data, '\t')
    assert(NameTokCodec.uncompressByteStream(enc, '\t').toSeq == data.toSeq)
  }

  test("randomized fuzz: arbitrary ASCII names round trip") {
    val rnd = new scala.util.Random(99)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789:._-/#"
    val names = (0 until 1000).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    rt(names)
  }
}
