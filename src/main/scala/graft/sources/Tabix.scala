package graft.sources

import java.io.{InputStream, OutputStream}
import graft.model.ReferenceRegion

/** Tabix (.tbi) index codec, from the published tabix specification: the
  * generic coordinate index for BGZF-compressed, coordinate-sorted TEXT
  * files (VCF/BED/GFF). The per-reference section layout (binning scheme +
  * 16 kb linear index) is byte-identical to BAI and shared with
  * [[Bai]]; Tabix adds a header naming the sequence/begin/end columns and
  * the reference-name dictionary. Region queries over an indexed
  * .vcf.gz read only the overlapping compressed chunks — the reference's
  * `loadIndexedVcf` (ADAMContext.scala:2690-2804) reaches this through
  * htsjdk's TabixReader.
  *
  * The index payload itself is BGZF-compressed (spec); [[read]]/[[write]]
  * wrap the stream accordingly.
  */
object Tabix {

  val Magic: Array[Byte] = Array('T', 'B', 'I', 1).map(_.toByte)

  /** Preset config for VCF (spec: format=2, seq col 1, begin col 2,
    * end col 0 = derived from the record, meta '#'). */
  case class Config(
      format: Int = 2, colSeq: Int = 1, colBeg: Int = 2, colEnd: Int = 0,
      meta: Char = '#', skip: Int = 0)

  case class TabixIndex(
      config: Config,
      names: IndexedSeq[String],
      refs: IndexedSeq[Bai.BaiRef]) {
    def refIdOf(name: String): Int = names.indexOf(name)
  }

  /** Builder over records written in file order (coordinate-sorted). */
  final class Builder(config: Config = Config()) {
    private val names = scala.collection.mutable.ArrayBuffer.empty[String]
    private val builders = scala.collection.mutable.ArrayBuffer.empty[Bai.Builder]
    private var cur = -1

    def add(refName: String, start: Long, end: Long,
        vStart: Long, vEnd: Long): Unit = {
      if (cur < 0 || names(cur) != refName) {
        val existing = names.indexOf(refName)
        cur =
          if (existing >= 0) existing
          else {
            names += refName
            // linear index sized lazily: use 512 Mbp upper bound windows
            builders += new Bai.Builder(1, Seq(1L << 29))
            names.length - 1
          }
      }
      builders(cur).add(0, start, end, vStart, vEnd)
    }

    def result(): TabixIndex = TabixIndex(
      config, names.toIndexedSeq,
      builders.map(b => trimLinear(b.result().refs.head)).toIndexedSeq)

    /** Drop the all-zero tail of the fixed-size linear array. */
    private def trimLinear(r: Bai.BaiRef): Bai.BaiRef = {
      var last = r.linear.length - 1
      while (last >= 0 && r.linear(last) == 0L) last -= 1
      r.copy(linear = r.linear.take(last + 1))
    }
  }

  def read(rawIn: InputStream): TabixIndex = {
    val in = Bgzf.inputStream(rawIn)
    val magic = Bai.readFully(in, 4)
    require(magic.sameElements(Magic), "not a tabix stream")
    val hdr = Bai.readFully(in, 32)
    val nRef = Bai.i32(hdr, 0)
    val config = Config(
      format = Bai.i32(hdr, 4), colSeq = Bai.i32(hdr, 8),
      colBeg = Bai.i32(hdr, 12), colEnd = Bai.i32(hdr, 16),
      meta = Bai.i32(hdr, 20).toChar, skip = Bai.i32(hdr, 24))
    val lNm = Bai.i32(hdr, 28)
    val nameBytes = Bai.readFully(in, lNm)
    val names = new String(nameBytes, "UTF-8").split('\u0000')
      .filter(_.nonEmpty).toIndexedSeq
    val refs = (0 until nRef).map(_ => Bai.readRefSection(in)).toIndexedSeq
    TabixIndex(config, names, refs)
  }

  def write(index: TabixIndex, rawOut: OutputStream): Unit = {
    val out = new Bgzf.BgzfOutputStream(rawOut)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write(Magic)
    w32(index.refs.length)
    w32(index.config.format); w32(index.config.colSeq)
    w32(index.config.colBeg); w32(index.config.colEnd)
    w32(index.config.meta.toInt); w32(index.config.skip)
    val nameBytes = index.names
      .flatMap(n => n.getBytes("UTF-8").toSeq :+ 0.toByte).toArray
    w32(nameBytes.length)
    out.write(nameBytes)
    index.refs.foreach(Bai.writeRefSection(_, out))
    out.close()
  }

  /** Disjoint chunk list covering all query regions (each line decodes at
    * most once across tasks). */
  def chunksForRegions(
      index: TabixIndex, regions: Seq[ReferenceRegion]): Seq[Bai.Chunk] = {
    val all = regions.flatMap { rr =>
      val ri = index.refIdOf(rr.referenceName)
      if (ri < 0) Seq.empty
      else Bai.chunksForRegion(
        Bai.BaiIndex(IndexedSeq(index.refs(ri))), 0, rr.start, rr.end)
    }.sortBy(_.beg)
    all.foldLeft(List.empty[Bai.Chunk]) { (acc, c) =>
      acc match {
        case h :: t if (c.beg >> 16) <= (h.end >> 16) =>
          h.copy(end = math.max(h.end, c.end)) :: t
        case _ => c :: acc
      }
    }.reverse
  }
}
