package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import scala.collection.mutable

/** BAI (BAM index) codec, from the SAM/BAM specification §5: the R-tree-ish
  * binning scheme (reg2bin/reg2bins pseudocode published in the spec) plus
  * a 16 kb linear index of virtual file offsets. Lets a region query read
  * only the compressed chunks whose records can overlap — the reference's
  * `loadIndexedBam` reaches this through htsjdk; this is the from-spec
  * equivalent (reference: ADAMContext.scala:2125-2243).
  *
  * Virtual offset = (compressed block offset << 16) | in-block offset.
  */
object Bai {

  val Magic: Array[Byte] = Array('B', 'A', 'I', 1).map(_.toByte)
  val LinearShift = 14 // 16 kb windows

  case class Chunk(beg: Long, end: Long) // virtual offsets, end exclusive
  case class BaiRef(bins: Map[Int, Seq[Chunk]], linear: Array[Long])
  case class BaiIndex(refs: IndexedSeq[BaiRef])

  /** Distinct bin of a 0-based half-open interval (spec pseudocode). */
  def reg2bin(beg0: Long, end0: Long): Int = {
    val beg = beg0
    val end = end0 - 1
    if (beg >> 14 == end >> 14) return (((1 << 15) - 1) / 7 + (beg >> 14)).toInt
    if (beg >> 17 == end >> 17) return (((1 << 12) - 1) / 7 + (beg >> 17)).toInt
    if (beg >> 20 == end >> 20) return (((1 << 9) - 1) / 7 + (beg >> 20)).toInt
    if (beg >> 23 == end >> 23) return (((1 << 6) - 1) / 7 + (beg >> 23)).toInt
    if (beg >> 26 == end >> 26) return (((1 << 3) - 1) / 7 + (beg >> 26)).toInt
    0
  }

  /** All bins a query interval can draw records from (spec pseudocode). */
  def reg2bins(beg: Long, end0: Long): Seq[Int] = {
    val end = end0 - 1
    val out = Seq.newBuilder[Int]
    out += 0
    var k = 1 + (beg >> 26); while (k <= 1 + (end >> 26)) { out += k.toInt; k += 1 }
    k = 9 + (beg >> 23); while (k <= 9 + (end >> 23)) { out += k.toInt; k += 1 }
    k = 73 + (beg >> 20); while (k <= 73 + (end >> 20)) { out += k.toInt; k += 1 }
    k = 585 + (beg >> 17); while (k <= 585 + (end >> 17)) { out += k.toInt; k += 1 }
    k = 4681 + (beg >> 14); while (k <= 4681 + (end >> 14)) { out += k.toInt; k += 1 }
    out.result()
  }

  // ------------------------------ builder ----------------------------------

  /** Accumulates (refId, start, end, vStart, vEnd) records during a
    * sequential BAM write and emits the index. */
  final class Builder(nRef: Int, refLengths: Seq[Long]) {
    private val bins =
      Array.fill(nRef)(mutable.Map.empty[Int, mutable.ArrayBuffer[Chunk]])
    private val linear = refLengths.map { l =>
      new Array[Long](math.max(1, ((l + (1L << LinearShift) - 1) >> LinearShift).toInt))
    }.toArray

    def add(refId: Int, start: Long, end: Long, vStart: Long, vEnd: Long): Unit = {
      if (refId < 0 || refId >= bins.length) return
      val bin = reg2bin(start, math.max(end, start + 1))
      val chunks = bins(refId).getOrElseUpdate(bin, mutable.ArrayBuffer.empty)
      // merge adjacent chunks (records written back-to-back)
      if (chunks.nonEmpty && chunks.last.end == vStart)
        chunks(chunks.length - 1) = chunks.last.copy(end = vEnd)
      else chunks += Chunk(vStart, vEnd)
      val lin = linear(refId)
      var w = (start >> LinearShift).toInt
      val wEnd = math.min((math.max(end, start + 1) - 1) >> LinearShift, lin.length - 1L).toInt
      while (w <= wEnd) {
        if (w >= 0 && w < lin.length && (lin(w) == 0L || vStart < lin(w)))
          lin(w) = vStart
        w += 1
      }
    }

    def result(): BaiIndex = BaiIndex(
      (0 until nRef).map(r =>
        BaiRef(bins(r).view.mapValues(_.toSeq).toMap, linear(r))).toIndexedSeq)
  }

  // ------------------------------- io --------------------------------------

  private[sources] def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var o = 0
    while (o < n) {
      val r = in.read(b, o, n - o)
      if (r < 0) throw new EOFException("truncated BAI")
      o += r
    }
    b
  }
  private[sources] def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  private[sources] def i64(b: Array[Byte], o: Int): Long =
    (i32(b, o).toLong & 0xffffffffL) | (i32(b, o + 4).toLong << 32)

  /** Read one per-reference section (bins + linear index) — shared with
    * the Tabix container, which uses the identical layout. */
  private[sources] def readRefSection(in: InputStream): BaiRef = {
    val nBin = i32(readFully(in, 4), 0)
    val bins = (0 until nBin).map { _ =>
      val hdr = readFully(in, 8)
      val bin = i32(hdr, 0)
      val nChunk = i32(hdr, 4)
      val cb = readFully(in, 16 * nChunk)
      bin -> (0 until nChunk).map(c =>
        Chunk(i64(cb, 16 * c), i64(cb, 16 * c + 8)))
    }.toMap
    val nIntv = i32(readFully(in, 4), 0)
    val lb = readFully(in, 8 * nIntv)
    BaiRef(bins, Array.tabulate(nIntv)(i => i64(lb, 8 * i)))
  }

  private[sources] def writeRefSection(r: BaiRef, out: OutputStream): Unit = {
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def w64(v: Long): Unit = { w32(v.toInt); w32((v >> 32).toInt) }
    w32(r.bins.size)
    r.bins.toSeq.sortBy(_._1).foreach { case (bin, chunks) =>
      w32(bin); w32(chunks.length)
      chunks.foreach { c => w64(c.beg); w64(c.end) }
    }
    w32(r.linear.length)
    r.linear.foreach(w64)
  }

  def read(in: InputStream): BaiIndex = {
    val magic = readFully(in, 4)
    require(magic.sameElements(Magic), "not a BAI stream")
    val nRef = i32(readFully(in, 4), 0)
    BaiIndex((0 until nRef).map(_ => readRefSection(in)).toIndexedSeq)
  }

  def write(index: BaiIndex, out: OutputStream): Unit = {
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write(Magic)
    w32(index.refs.length)
    index.refs.foreach(writeRefSection(_, out))
    out.flush()
  }

  /** Chunks that can hold records overlapping [start, end) on `refId`,
    * lower-bounded by the linear index and merged when near-adjacent
    * (same compressed block or touching). */
  def chunksForRegion(index: BaiIndex, refId: Int, start: Long, end: Long): Seq[Chunk] = {
    if (refId < 0 || refId >= index.refs.length) return Seq.empty
    val ref = index.refs(refId)
    val minV = {
      val w = (start >> LinearShift).toInt
      if (w >= 0 && w < ref.linear.length && ref.linear(w) != 0L) ref.linear(w)
      else 0L
    }
    val raw = reg2bins(start, end).flatMap(ref.bins.get).flatten
      .filter(_.end > minV)
      .map(c => if (c.beg < minV) c.copy(beg = minV) else c)
      .sortBy(_.beg)
    // merge overlapping / same-block-adjacent chunks
    val merged = mutable.ArrayBuffer.empty[Chunk]
    raw.foreach { c =>
      if (merged.nonEmpty && (c.beg >> 16) <= (merged.last.end >> 16))
        merged(merged.length - 1) =
          merged.last.copy(end = math.max(merged.last.end, c.end))
      else merged += c
    }
    merged.toSeq
  }
}
