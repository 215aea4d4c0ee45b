package graft.sources

import java.io.{DataInputStream, InputStream}
import graft.core.ReferenceContigs

/** UCSC .2bit reference codec (public format spec: 16-byte header, contig
  * index, per-contig packed 2-bit bases T=0,C=1,A=2,G=3 with N-block and
  * mask-block lists). The reference wraps this in util/TwoBitFile.scala:
  * 59-183 for broadcast random access; here it loads into
  * [[ReferenceContigs]] — the same broadcast pattern.
  */
object TwoBit {

  private val Signature = 0x1A412743
  private val Bases = "TCAG"

  private final class Reader(in: InputStream) {
    private val d = new DataInputStream(new java.io.BufferedInputStream(in))
    private var swap = false
    var pos = 0L
    def u8(): Int = { pos += 1; d.readUnsignedByte() }
    def u32(): Long = {
      val b = Array(u8(), u8(), u8(), u8())
      val v = if (swap) (b(3).toLong << 24) | (b(2).toLong << 16) | (b(1).toLong << 8) | b(0)
      else (b(0).toLong << 24) | (b(1).toLong << 16) | (b(2).toLong << 8) | b(3)
      v & 0xffffffffL
    }
    def checkSignature(): Unit = {
      val first = u32()
      if (first == (Signature & 0xffffffffL)) swap = false
      else {
        // little-endian file: bytes reversed
        val rev = java.lang.Long.reverseBytes(first << 32) & 0xffffffffL
        require(rev == (Signature & 0xffffffffL), f"bad 2bit signature $first%x")
        swap = true
      }
    }
    def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); d.readFully(b); pos += n; b
    }
    def skipTo(target: Long): Unit = {
      require(target >= pos, s"cannot seek backwards $pos -> $target")
      var left = target - pos
      while (left > 0) {
        val s = d.skip(left)
        if (s > 0) { pos += s; left -= s }
        else { u8(); left -= 1 } // skip() may return 0 on some streams
      }
    }
  }

  /** Parse a .2bit stream into contig strings (Ns restored; mask blocks
    * lower-cased). Contigs must appear in offset order (true for files
    * written by faToTwoBit and by [[write]]). */
  def read(in: InputStream): ReferenceContigs = {
    val r = new Reader(in)
    r.checkSignature()
    val version = r.u32(); require(version == 0L, s"2bit version $version")
    val n = r.u32().toInt
    r.u32() // reserved
    val index = (0 until n).map { _ =>
      val nameLen = r.u8()
      val name = new String(r.bytes(nameLen), "ISO-8859-1")
      val offset = r.u32()
      (name, offset)
    }.sortBy(_._2)

    val contigs = index.map { case (name, offset) =>
      r.skipTo(offset)
      val dnaSize = r.u32().toInt
      val nBlockCount = r.u32().toInt
      val nStarts = Array.fill(nBlockCount)(r.u32())
      val nSizes = Array.fill(nBlockCount)(r.u32())
      val maskCount = r.u32().toInt
      val maskStarts = Array.fill(maskCount)(r.u32())
      val maskSizes = Array.fill(maskCount)(r.u32())
      r.u32() // reserved
      val packed = r.bytes((dnaSize + 3) / 4)
      val sb = new StringBuilder(dnaSize)
      var i = 0
      while (i < dnaSize) {
        val b = packed(i / 4) & 0xff
        val shift = 6 - 2 * (i % 4)
        sb.append(Bases.charAt((b >> shift) & 0x3))
        i += 1
      }
      val arr = sb.toString.toCharArray
      var k = 0
      while (k < nBlockCount) {
        var j = nStarts(k)
        while (j < nStarts(k) + nSizes(k)) { arr(j.toInt) = 'N'; j += 1 }
        k += 1
      }
      k = 0
      while (k < maskCount) {
        var j = maskStarts(k)
        while (j < maskStarts(k) + maskSizes(k)) {
          arr(j.toInt) = Character.toLowerCase(arr(j.toInt)); j += 1
        }
        k += 1
      }
      name -> new String(arr)
    }.toMap
    ReferenceContigs(contigs)
  }

  def readFile(path: String): ReferenceContigs = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try read(in) finally in.close()
  }

  /** Write contigs as big-endian .2bit (Ns and case masks preserved as
    * block lists). */
  def write(contigs: ReferenceContigs, out: java.io.OutputStream): Unit = {
    val o = new java.io.DataOutputStream(new java.io.BufferedOutputStream(out))
    def u32(v: Long): Unit = o.writeInt(v.toInt)

    val entries = contigs.contigs.toSeq.sortBy(_._1)
    u32(Signature); u32(0); u32(entries.length); u32(0)
    val indexSize = entries.map(e => 1 + e._1.length + 4).sum
    var offset = 16L + indexSize
    val offsets = entries.map { case (name, seq) =>
      val here = offset
      val nBlocks = blocksWhere(seq, c => c == 'N' || c == 'n')
      val maskBlocks = blocksWhere(seq, _.isLower)
      offset += 4 + 4 + 8L * nBlocks.length + 4 + 8L * maskBlocks.length + 4 +
        (seq.length + 3) / 4
      (name, seq, here, nBlocks, maskBlocks)
    }
    offsets.foreach { case (name, _, off, _, _) =>
      o.writeByte(name.length)
      o.writeBytes(name)
      u32(off)
    }
    offsets.foreach { case (_, seq, _, nBlocks, maskBlocks) =>
      u32(seq.length.toLong)
      u32(nBlocks.length.toLong)
      nBlocks.foreach(b => u32(b._1))
      nBlocks.foreach(b => u32(b._2))
      u32(maskBlocks.length.toLong)
      maskBlocks.foreach(b => u32(b._1))
      maskBlocks.foreach(b => u32(b._2))
      u32(0)
      var acc = 0; var nIn = 0
      seq.foreach { c =>
        val code = Character.toUpperCase(c) match {
          case 'C' => 1; case 'A' => 2; case 'G' => 3; case _ => 0
        }
        acc = (acc << 2) | code; nIn += 1
        if (nIn == 4) { o.writeByte(acc); acc = 0; nIn = 0 }
      }
      if (nIn > 0) o.writeByte(acc << (2 * (4 - nIn)))
    }
    o.flush()
  }

  private def blocksWhere(seq: String, p: Char => Boolean): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var i = 0
    while (i < seq.length) {
      if (p(seq.charAt(i))) {
        val start = i
        while (i < seq.length && p(seq.charAt(i))) i += 1
        out += ((start.toLong, (i - start).toLong))
      } else i += 1
    }
    out.result()
  }
}
