package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.core.ReferenceContigs
import graft.model.ReferenceRegion

class TwoBitSpec extends AnyFunSuite {

  test("2bit round trip preserves bases, N blocks, and case masks") {
    val contigs = ReferenceContigs(Map(
      "chr1" -> "ACGTACGTNNNNacgtACGTA",   // N block + soft-mask block
      "chr2" -> "TTTT",
      "chrN" -> "NNNNN"))
    val buf = new java.io.ByteArrayOutputStream()
    TwoBit.write(contigs, buf)
    val back = TwoBit.read(new java.io.ByteArrayInputStream(buf.toByteArray))
    assert(back.contigs == contigs.contigs)
  }

  test("2bit extract serves region queries") {
    val contigs = ReferenceContigs(Map("chr1" -> "AAAACCCCGGGGTTTT"))
    val buf = new java.io.ByteArrayOutputStream()
    TwoBit.write(contigs, buf)
    val back = TwoBit.read(new java.io.ByteArrayInputStream(buf.toByteArray))
    assert(back.extract(ReferenceRegion("chr1", 4, 12)) == "CCCCGGGG")
  }

  test("odd-length packing") {
    val contigs = ReferenceContigs(Map("x" -> "ACG", "y" -> "ACGTA"))
    val buf = new java.io.ByteArrayOutputStream()
    TwoBit.write(contigs, buf)
    val back = TwoBit.read(new java.io.ByteArrayInputStream(buf.toByteArray))
    assert(back.contigs == contigs.contigs)
  }
}
