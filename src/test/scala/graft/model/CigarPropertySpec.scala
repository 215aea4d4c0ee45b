package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import Prop.forAll

/** ScalaCheck laws for the CIGAR algebra — the primitive under duplicate
  * marking (5' clipped positions), realignment, coverage, and the
  * BAM/CRAM codecs. */
object CigarPropertySpec extends Properties("Cigar") {

  private val genElement: Gen[Cigar.Element] = for {
    len <- Gen.choose(1, 50)
    op <- Gen.oneOf('M', 'I', 'D', 'N', 'S', 'H', 'P', '=', 'X')
  } yield Cigar.Element(len, op)

  private val genCigar: Gen[Seq[Cigar.Element]] =
    Gen.nonEmptyListOf(genElement).map(_.take(12))

  private def format(es: Seq[Cigar.Element]): String =
    es.map(e => s"${e.length}${e.op}").mkString

  property("parse(format(x)) round trips") = forAll(genCigar) { es =>
    Cigar.parse(format(es)) == es
  }

  property("referenceLength = sum of M/D/N/=/X lengths") = forAll(genCigar) { es =>
    Cigar.referenceLength(format(es)) ==
      es.filter(e => "MDN=X".contains(e.op)).map(_.length.toLong).sum
  }

  property("readLength = sum of M/I/S/=/X lengths") = forAll(genCigar) { es =>
    Cigar.readLength(format(es)) ==
      es.filter(e => "MIS=X".contains(e.op)).map(_.length.toLong).sum
  }

  property("5' position: start minus leading clip on +, end plus trailing clip on -") =
    forAll(genCigar, Gen.choose(100L, 10000L), Gen.oneOf(true, false)) { (es, start, neg) =>
      val c = format(es)
      val end = start + Cigar.referenceLength(c)
      val fp = Cigar.fivePrimePosition(start, end, c, neg)
      if (neg) fp == end + Cigar.endClip(c) // half-open end + trailing clip
      else fp == start - Cigar.startClip(c)
    }

  property("clips only count soft/hard runs at the ends") = forAll(genCigar) { es =>
    val c = format(es)
    val lead = es.takeWhile(e => e.op == 'S' || e.op == 'H').map(_.length).sum
    val trail = es.reverse.takeWhile(e => e.op == 'S' || e.op == 'H').map(_.length).sum
    Cigar.startClip(c) == lead && Cigar.endClip(c) == trail
  }
}

/** Laws for MD-tag parse/build against reference reconstruction. */
object MdTagPropertySpec extends Properties("MdTag") {

  import graft.functions.GenomicFunctions

  private val bases = "ACGT"
  private val genSeq: Gen[String] = for {
    n <- Gen.choose(8, 40)
    s <- Gen.listOfN(n, Gen.oneOf('A', 'C', 'G', 'T'))
  } yield s.mkString

  property("buildMdTag over all-match yields the plain length") =
    forAll(genSeq) { s =>
      GenomicFunctions.buildMdTag(s, s"${s.length}M", s) == s.length.toString
    }

  property("mismatch offsets recover exactly the mutated positions") =
    forAll(genSeq, Gen.choose(0, 7)) { (s, seed) =>
      val rnd = new scala.util.Random(seed)
      // mutate a few positions to a DIFFERENT base
      val positions = (0 until s.length).filter(_ => rnd.nextBoolean()).take(5)
      val read = s.toCharArray
      positions.foreach { p =>
        read(p) = bases((bases.indexOf(s(p)) + 1 + rnd.nextInt(3)) % 4)
      }
      val readS = new String(read)
      val realMismatches = (0 until s.length).filter(i => readS(i) != s(i))
      val md = GenomicFunctions.buildMdTag(readS, s"${s.length}M", s)
      GenomicFunctions.mdMismatchOffsets(md).map(_.toInt) == realMismatches
    }
}
