package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Cigar

class GenomicFunctionsSpec extends AnyFunSuite {
  import GenomicFunctions._

  test("cigar parse and lengths") {
    assert(Cigar.parse("5S70M1I4D2N3H") == Seq(
      Cigar.Element(5, 'S'), Cigar.Element(70, 'M'), Cigar.Element(1, 'I'),
      Cigar.Element(4, 'D'), Cigar.Element(2, 'N'), Cigar.Element(3, 'H')))
    assert(Cigar.referenceLength("5S70M1I4D2N3H") == 76L)
    assert(Cigar.readLength("5S70M1I4D2N3H") == 76L)
    assert(Cigar.parse("*").isEmpty)
    assert(Cigar.startClip("5S70M") == 5)
    assert(Cigar.endClip("70M5S3H") == 8)
  }

  test("five prime position honors clipping and strand") {
    assert(Cigar.fivePrimePosition(100, 176, "5S70M", negativeStrand = false) == 95)
    assert(Cigar.fivePrimePosition(100, 170, "70M3S", negativeStrand = true) == 173)
  }

  test("phred math") {
    assert(math.abs(phredToErrorProbability(10) - 0.1) < 1e-12)
    assert(math.abs(phredToErrorProbability(30) - 0.001) < 1e-12)
    assert(errorProbabilityToPhred(0.001) == 30)
    assert(qualityCharToPhred('I') == 40)
  }

  test("quality binning") {
    val bins = Seq((0, 20, 10), (20, 40, 30))
    // '#'=2 -> bin center 10 -> '+'; 'I'=40 -> out of bins, kept
    assert(binQualities("#I5", bins) == "+I?")
  }

  test("reverse complement") {
    assert(reverseComplement("ACGT") == "ACGT")
    assert(reverseComplement("AACG") == "CGTT")
    assert(reverseComplement("acgtN") == "Nacgt")
  }

  test("MD tag parse and offsets") {
    assert(parseMdTag("10A5^AC6") == Seq(
      MdMatch(10), MdMismatch('A'), MdMatch(5), MdDeletion("AC"), MdMatch(6)))
    assert(mdMismatchOffsets("10A5^AC6") == Seq(10L))
    assert(mdMismatchOffsets("0A0C10") == Seq(0L, 1L))
    assert(mdMismatchCount("10A5^AC6") == 1)
  }

  test("MD tag build round-trips against reference sequence") {
    // read ACGTACGT aligned 8M to ref ACGAACGT -> mismatch at offset 3 (ref A)
    assert(buildMdTag("ACGTACGT", "8M", "ACGAACGT") == "3A4")
    // full match
    assert(buildMdTag("ACGT", "4M", "ACGT") == "4")
    // deletion: read ACGT vs ref ACXXGT, cigar 2M2D2M
    assert(buildMdTag("ACGT", "2M2D2M", "ACTTGT") == "2^TT2")
    // soft clip skips read bases
    assert(buildMdTag("TTACGT", "2S4M", "ACGT") == "4")
    // insertion consumes read only
    assert(buildMdTag("ACXXGT", "2M2I2M", "ACGT") == "4")
  }
}
