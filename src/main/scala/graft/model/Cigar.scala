package graft.model

/** Minimal CIGAR algebra (no htsjdk in this stack). Public SAM spec
  * semantics; usage mirrors the reference's clipping-aware 5' position math
  * in ds/read/ReferencePositionPair.scala (duplicate marking) and
  * MdTag moves (models/MdTag.scala).
  */
object Cigar {

  case class Element(length: Int, op: Char)

  /** Parse "76M" / "5S70M1I" etc. Returns empty for null/"*"/"". */
  def parse(cigar: String): Seq[Element] = {
    if (cigar == null || cigar.isEmpty || cigar == "*") return Seq.empty
    val out = Seq.newBuilder[Element]
    var num = 0
    var i = 0
    while (i < cigar.length) {
      val c = cigar.charAt(i)
      if (c.isDigit) num = num * 10 + (c - '0')
      else { out += Element(num, c); num = 0 }
      i += 1
    }
    out.result()
  }

  /** Ops consuming reference bases (M/D/N/=/X). */
  def referenceLength(cigar: String): Long =
    parse(cigar).collect {
      case Element(l, 'M' | 'D' | 'N' | '=' | 'X') => l.toLong
    }.sum

  /** Ops consuming read bases (M/I/S/=/X). */
  def readLength(cigar: String): Long =
    parse(cigar).collect {
      case Element(l, 'M' | 'I' | 'S' | '=' | 'X') => l.toLong
    }.sum

  private def clip(es: Seq[Element]): Int =
    es.takeWhile(e => e.op == 'S' || e.op == 'H').map(_.length).sum

  /** Soft+hard clipped bases at the alignment start. */
  def startClip(cigar: String): Int = clip(parse(cigar))

  /** Soft+hard clipped bases at the alignment end. */
  def endClip(cigar: String): Int = clip(parse(cigar).reverse)

  /** Unclipped 5' coordinate of a read — the duplicate-marking position key
    * (ReferencePositionPair.scala:115 semantics): forward strand = start
    * minus leading clip; reverse strand = end plus trailing clip. */
  def fivePrimePosition(start: Long, end: Long, cigar: String,
      negativeStrand: Boolean): Long =
    if (negativeStrand) end + endClip(cigar) else start - startClip(cigar)
}
