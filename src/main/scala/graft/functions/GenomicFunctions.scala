package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.Cigar

/** Scalar genomics "stdlib" (SURVEY.md §2.9) — domain functions the
  * reference implements as plain Scala (models/MdTag.scala,
  * util/PhredUtils.scala, models/Alphabet.scala), exposed both as Scala
  * helpers and as Column functions. Pure per-row logic: every Column here
  * stays inside whole-stage codegen or a cheap deterministic UDF.
  */
object GenomicFunctions {

  // --------------------------- Phred math ---------------------------------
  // util/PhredUtils.scala semantics.

  def phredToErrorProbability(phred: Int): Double =
    math.pow(10.0, -phred / 10.0)

  def phredToSuccessProbability(phred: Int): Double =
    1.0 - phredToErrorProbability(phred)

  def errorProbabilityToPhred(p: Double): Int =
    math.round(-10.0 * math.log10(p)).toInt

  /** FASTQ quality char (Phred+33) to int. */
  def qualityCharToPhred(c: Char): Int = c - 33

  /** Quality-score binning (BinQualities.scala:112-160): rewrite each
    * quality char to its bin's center value. Bins = (low, high, center]. */
  def binQualities(quals: String, bins: Seq[(Int, Int, Int)]): String =
    if (quals == null) null
    else quals.map { c =>
      val q = c - 33
      bins.find(b => q >= b._1 && q < b._2)
        .map(b => (b._3 + 33).toChar).getOrElse(c)
    }

  // ------------------------ sequence alphabet -----------------------------
  // models/Alphabet.scala:148 semantics.

  private val dnaComplement: Map[Char, Char] = {
    val base = Map('A' -> 'T', 'T' -> 'A', 'C' -> 'G', 'G' -> 'C',
      'N' -> 'N', 'U' -> 'A')
    base ++ base.map { case (k, v) => k.toLower -> v.toLower }
  }

  def complement(c: Char): Char = dnaComplement.getOrElse(c, 'N')

  def reverseComplement(seq: String): String =
    if (seq == null) null else seq.reverseIterator.map(complement).mkString

  /** Column form — UDF (string transform; negligible vs scan cost). */
  val reverseComplementCol: Column => Column = {
    val f = udf((s: String) => reverseComplement(s))
    f.apply(_)
  }

  // ------------------------------ k-mers ----------------------------------

  /** All k-length substrings of a sequence column, as an array column.
    * A tight JVM loop beats the `transform(sequence(...), substr)`
    * formulation: Spark's higher-order array functions are CodegenFallback
    * (interpreted per element), while a primitive-loop UDF runs compiled —
    * the same lesson as the cosine kernel (q37). Strings shorter than k
    * yield no k-mers. countKmers = explode(this) + groupBy().count()
    * (AlignmentDataset.scala:784-795 shape). */
  def kmers(colName: String, k: Int): Column = {
    val kk = k
    val f = udf { (s: String) =>
      if (s == null || s.length < kk) Array.empty[String]
      else {
        val n = s.length - kk + 1
        val out = new Array[String](n)
        var i = 0
        while (i < n) { out(i) = s.substring(i, i + kk); i += 1 }
        out
      }
    }
    f(col(colName))
  }

  // --------------------------- MD-tag algebra -----------------------------
  // models/MdTag.scala (611 LoC) — parse + mismatch reconstruction.

  sealed trait MdEvent
  case class MdMatch(run: Int) extends MdEvent
  case class MdMismatch(refBase: Char) extends MdEvent
  case class MdDeletion(refBases: String) extends MdEvent

  /** Parse an MD tag ("10A5^AC6") into events. */
  def parseMdTag(md: String): Seq[MdEvent] = {
    if (md == null || md.isEmpty) return Seq.empty
    val out = Seq.newBuilder[MdEvent]
    var i = 0
    while (i < md.length) {
      val c = md.charAt(i)
      if (c.isDigit) {
        var n = 0
        while (i < md.length && md.charAt(i).isDigit) {
          n = n * 10 + (md.charAt(i) - '0'); i += 1
        }
        if (n > 0) out += MdMatch(n)
      } else if (c == '^') {
        i += 1
        val sb = new StringBuilder
        while (i < md.length && md.charAt(i).isLetter) { sb += md.charAt(i); i += 1 }
        out += MdDeletion(sb.toString)
      } else {
        out += MdMismatch(c); i += 1
      }
    }
    out.result()
  }

  /** Reference-space offsets (relative to alignment start) of mismatching
    * bases, from an MD tag. */
  def mdMismatchOffsets(md: String): Seq[Long] = {
    var pos = 0L
    val out = Seq.newBuilder[Long]
    parseMdTag(md).foreach {
      case MdMatch(n) => pos += n
      case MdMismatch(_) => out += pos; pos += 1
      case MdDeletion(b) => pos += b.length
    }
    out.result()
  }

  /** Number of mismatches + deletions recorded in an MD tag (the NM-ish
    * summary used in MDTagging validation, ds/read/MDTagging.scala:41-93). */
  def mdMismatchCount(md: String): Int =
    parseMdTag(md).count {
      case MdMismatch(_) => true
      case _ => false
    }

  /** Left-normalize a single indel inside a CIGAR: slide the indel left
    * one base at a time while the base preceding the indel equals the base
    * at its end (the standard public left-alignment rule; reference
    * leftNormalizeIndels, algorithms/consensus/NormalizationUtils.scala:
    * 156 via AlignmentDataset.scala:1777-1804). Returns the adjusted
    * CIGAR; the alignment start never moves (only the in-read placement
    * of the indel shifts). */
  def leftNormalizeCigar(readSeq: String, cigar: String): String = {
    val es = Cigar.parse(cigar).toArray
    val idx = es.indexWhere(e => e.op == 'I' || e.op == 'D')
    if (idx <= 0 || es(idx - 1).op != 'M') return cigar
    // only normalize the M-indel-M core shape
    if (idx + 1 < es.length && es(idx + 1).op != 'M') return cigar

    // read positions: bases consumed before the indel
    var readBefore = 0
    es.take(idx).foreach { e =>
      if (e.op == 'M' || e.op == 'I' || e.op == 'S' || e.op == '=' || e.op == 'X')
        readBefore += e.length
    }
    val ind = es(idx)
    var shift = 0
    if (ind.op == 'I') {
      // insertion of length L at readBefore..readBefore+L: can shift left
      // while read[readBefore-1-shift] == read[readBefore+L-1-shift]
      val L = ind.length
      while (idx - 1 >= 0 && shift < es(idx - 1).length - 1 &&
        readBefore - 1 - shift >= 0 &&
        readBefore + L - 1 - shift < readSeq.length &&
        readSeq.charAt(readBefore - 1 - shift) ==
          readSeq.charAt(readBefore + L - 1 - shift)) shift += 1
    } else {
      // deletion: shift left while the read base before the deletion equals
      // the read base just after it (homopolymer/repeat sliding observable
      // from the read alone)
      while (idx - 1 >= 0 && shift < es(idx - 1).length - 1 &&
        readBefore - 1 - shift >= 0 && readBefore - shift < readSeq.length &&
        readSeq.charAt(readBefore - 1 - shift) ==
          readSeq.charAt(readBefore - shift)) shift += 1
    }
    if (shift == 0) cigar
    else {
      es(idx - 1) = Cigar.Element(es(idx - 1).length - shift, 'M')
      es(idx + 1) = Cigar.Element(es(idx + 1).length + shift, 'M')
      es.map(e => s"${e.length}${e.op}").mkString
    }
  }

  /** Build an MD tag given the read sequence, CIGAR, and the reference
    * bases covered by the alignment (computeMismatchingPositions semantics,
    * ds/read/MDTagging.scala with a broadcast reference). */
  def buildMdTag(readSeq: String, cigar: String, refSeq: String): String = {
    val sb = new StringBuilder
    var matchRun = 0
    var readPos = 0
    var refPos = 0
    Cigar.parse(cigar).foreach { e =>
      e.op match {
        case 'M' | '=' | 'X' =>
          var k = 0
          while (k < e.length) {
            val r = Character.toUpperCase(refSeq.charAt(refPos))
            val q = Character.toUpperCase(readSeq.charAt(readPos))
            if (r == q) matchRun += 1
            else { sb.append(matchRun); sb.append(r); matchRun = 0 }
            readPos += 1; refPos += 1; k += 1
          }
        case 'I' | 'S' => readPos += e.length
        case 'D' =>
          sb.append(matchRun); matchRun = 0
          sb.append('^')
          sb.append(refSeq.substring(refPos, refPos + e.length).toUpperCase)
          refPos += e.length
        case 'N' => refPos += e.length
        case _ => // H/P consume nothing
      }
    }
    sb.append(matchRun)
    sb.toString
  }
}
