package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, GZIPInputStream, Inflater}

/** BGZF container codec (public SAM/BAM spec §4.1: gzip members ≤64 KiB
  * uncompressed, each carrying a BC/BSIZE extra subfield, terminated by a
  * fixed empty EOF member). Reading rides GZIPInputStream's multi-member
  * support; writing assembles members by hand around a raw Deflater.
  * The reference reads BGZF through hadoop-bam/htsjdk (not present in this
  * stack) — this is a from-spec implementation. */
object Bgzf {

  /** The fixed 28-byte BGZF EOF marker block (spec appendix). */
  val EofMarker: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /** Decompressing stream over a BGZF file. */
  def inputStream(in: InputStream): InputStream =
    new GZIPInputStream(new java.io.BufferedInputStream(in), 1 << 16)

  // ----------------------- block-level (split) reading ---------------------

  private def readFullyOrFail(in: InputStream, b: Array[Byte], off: Int, n: Int): Unit = {
    var o = off
    while (o < off + n) {
      val r = in.read(b, o, off + n - o)
      if (r < 0) throw new EOFException("truncated BGZF block")
      o += r
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Read one BGZF member from a positioned stream: (decompressed payload,
    * compressed size). None at clean EOF. */
  def readBlock(in: InputStream): Option[(Array[Byte], Int)] = {
    val first = in.read()
    if (first < 0) return None
    val hdr = new Array[Byte](12)
    hdr(0) = first.toByte
    readFullyOrFail(in, hdr, 1, 11)
    if ((hdr(0) & 0xff) != 0x1f || (hdr(1) & 0xff) != 0x8b ||
      hdr(2) != 8 || (hdr(3) & 4) == 0)
      throw new IllegalStateException("not a BGZF member header")
    val xlen = u16(hdr, 10)
    val extra = new Array[Byte](xlen)
    readFullyOrFail(in, extra, 0, xlen)
    var bsize = -1
    var i = 0
    while (i + 4 <= xlen && bsize < 0) {
      val slen = u16(extra, i + 2)
      if (extra(i) == 'B' && extra(i + 1) == 'C' && slen == 2)
        bsize = u16(extra, i + 4)
      i += 4 + slen
    }
    require(bsize >= 0, "BGZF member missing BC subfield")
    val cdataLen = bsize + 1 - 12 - xlen - 8
    val cdata = new Array[Byte](cdataLen)
    readFullyOrFail(in, cdata, 0, cdataLen)
    val footer = new Array[Byte](8)
    readFullyOrFail(in, footer, 0, 8)
    val isize = (footer(4) & 0xff) | ((footer(5) & 0xff) << 8) |
      ((footer(6) & 0xff) << 16) | ((footer(7) & 0xff) << 24)
    val out = new Array[Byte](isize)
    if (isize > 0) {
      val inf = new Inflater(true)
      inf.setInput(cdata)
      var done = 0
      while (done < isize && !inf.finished())
        done += inf.inflate(out, done, isize - done)
      inf.end()
      if (done != isize) throw new EOFException("short BGZF inflate")
    }
    Some((out, bsize + 1))
  }

  /** Scan the compressed stream (positioned at `from`) for the next BGZF
    * member boundary at absolute offset >= from. Any byte offset is within
    * 64 KiB of a boundary (BSIZE <= 0xffff), so a bounded window suffices.
    * A candidate is accepted only when the member it declares is followed
    * by another member header (or ends the file) — false magic inside
    * compressed payload fails that check. Returns -1 when no boundary
    * exists in [from, fileSize). */
  def findNextBlockStart(raw: InputStream, from: Long, fileSize: Long): Long = {
    if (from >= fileSize) return -1L
    val window = math.min(3L * 65536, fileSize - from).toInt
    val buf = new Array[Byte](window)
    var got = 0
    var r = 0
    while (got < window && r >= 0) {
      r = raw.read(buf, got, window - got)
      if (r > 0) got += r
    }
    var i = 0
    while (i + 18 <= got) {
      if ((buf(i) & 0xff) == 0x1f && (buf(i + 1) & 0xff) == 0x8b &&
        buf(i + 2) == 8 && (buf(i + 3) & 4) != 0) {
        val xlen = u16(buf, i + 10)
        if (xlen >= 6 && i + 12 + xlen <= got) {
          var bsize = -1
          var j = 0
          while (j + 4 <= xlen && bsize < 0) {
            val slen = u16(buf, i + 12 + j + 2)
            if (buf(i + 12 + j) == 'B' && buf(i + 12 + j + 1) == 'C' && slen == 2)
              bsize = u16(buf, i + 12 + j + 4)
            j += 4 + slen
          }
          if (bsize >= 27) {
            val nxt = i + bsize + 1
            val atEof = from + nxt >= fileSize
            val nextOk = nxt + 4 <= got &&
              (buf(nxt) & 0xff) == 0x1f && (buf(nxt + 1) & 0xff) == 0x8b &&
              buf(nxt + 2) == 8 && (buf(nxt + 3) & 4) != 0
            if (atEof || nextOk) return from + i
          }
        }
      }
      i += 1
    }
    -1L
  }

  /** Decompressing stream over successive BGZF members that tracks which
    * compressed block each byte came from — the ownership test for
    * splittable reads (a split owns records whose first byte lies in a
    * block starting inside [splitStart, splitEnd); the stream itself never
    * stops at splitEnd so a spanning record can drain into the next
    * split's blocks). `peek` preloads without consuming, for record-start
    * guessing. */
  final class BgzfBlockInput(raw: InputStream, firstBlockOffset: Long)
      extends InputStream {
    private case class Blk(start: Long, data: Array[Byte])
    private val blocks = new java.util.ArrayDeque[Blk]()
    private var posInHead = 0
    private var nextOffset = firstBlockOffset
    private var eof = false

    private def loadOne(): Boolean =
      !eof && (readBlock(raw) match {
        case Some((data, csize)) =>
          blocks.addLast(Blk(nextOffset, data)); nextOffset += csize; true
        case None => eof = true; false
      })

    private def ensureReadable(): Boolean = {
      while (true) {
        val h = blocks.peekFirst()
        if (h == null) { if (!loadOne()) return false }
        else if (posInHead >= h.data.length) { blocks.pollFirst(); posInHead = 0 }
        else return true
      }
      false
    }

    /** Compressed offset of the block that will supply the next byte
      * (lower-bounded by the next unloaded block's offset at a block edge). */
    def nextByteBlockStart: Long = {
      val it = blocks.iterator()
      var first = true
      while (it.hasNext) {
        val b = it.next()
        val consumed = if (first) posInHead else 0
        if (consumed < b.data.length) return b.start
        first = false
      }
      nextOffset
    }

    /** Unread length of the first not-fully-consumed block (preloads one). */
    def firstUnreadBlockLen: Int =
      if (ensureReadable()) blocks.peekFirst().data.length - posInHead else 0

    /** BAM virtual position of the next byte:
      * (block compressed offset << 16) | in-block offset. */
    def virtualPos: Long =
      if (ensureReadable())
        (blocks.peekFirst().start << 16) | posInHead.toLong
      else (nextOffset << 16)

    /** Copy of the next up-to-maxBytes unread bytes, without consuming. */
    def peek(maxBytes: Int): Array[Byte] = {
      var avail = unreadLoaded
      while (avail < maxBytes && loadOne()) avail = unreadLoaded
      val out = new Array[Byte](math.min(maxBytes.toLong, avail).toInt)
      var o = 0
      val it = blocks.iterator()
      var first = true
      while (it.hasNext && o < out.length) {
        val b = it.next()
        val from = if (first) posInHead else 0
        first = false
        val take = math.min(b.data.length - from, out.length - o)
        if (take > 0) { System.arraycopy(b.data, from, out, o, take); o += take }
      }
      out
    }

    private def unreadLoaded: Long = {
      var s = 0L
      val it = blocks.iterator()
      var first = true
      while (it.hasNext) {
        val b = it.next()
        s += b.data.length - (if (first) posInHead else 0)
        first = false
      }
      s
    }

    def skipFully(n: Long): Unit = {
      var left = n
      while (left > 0) {
        if (!ensureReadable()) throw new EOFException("skip past BGZF end")
        val h = blocks.peekFirst()
        val take = math.min(left, (h.data.length - posInHead).toLong).toInt
        posInHead += take; left -= take
      }
    }

    override def read(): Int =
      if (!ensureReadable()) -1
      else {
        val h = blocks.peekFirst()
        val v = h.data(posInHead) & 0xff
        posInHead += 1
        v
      }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (len == 0) 0
      else if (!ensureReadable()) -1
      else {
        val h = blocks.peekFirst()
        val take = math.min(len, h.data.length - posInHead)
        System.arraycopy(h.data, posInHead, b, off, take)
        posInHead += take
        take
      }

    override def close(): Unit = raw.close()

    /** Read one '\n'-terminated line: (text without terminator, block
      * offset of the terminator byte — of the last byte when the final
      * line is unterminated). Null at EOF. */
    def readLine(): (String, Long) = {
      if (!ensureReadable()) return null
      val sb = new java.io.ByteArrayOutputStream(128)
      var termBlock = -1L
      var done = false
      while (!done) {
        if (!ensureReadable()) { done = true }
        else {
          val h = blocks.peekFirst()
          val blockStart = h.start
          val b = h.data(posInHead)
          posInHead += 1
          if (b == '\n') { termBlock = blockStart; done = true }
          else { sb.write(b); termBlock = blockStart }
        }
      }
      (new String(sb.toByteArray, "UTF-8"), termBlock)
    }
  }

  /** Lines of one split of a BGZF text file. Ownership: a split owns every
    * line whose terminating '\n' lives in a block starting inside
    * [start, end) (the final unterminated line belongs to the split owning
    * its last byte). Each split discards through the first newline when
    * start > 0 (the previous split reads that line, draining past its own
    * end), so every line is read exactly once with no cross-split
    * coordination. */
  def splitLines(
      raw: InputStream, fileSize: Long, start: Long, end: Long,
      seek: Long => Unit): Iterator[String] = {
    val b0 =
      if (start == 0L) 0L
      else {
        seek(start)
        findNextBlockStart(raw, start, fileSize)
      }
    if (b0 < 0 || b0 >= end) { raw.close(); return Iterator.empty }
    if (start > 0L) seek(b0)
    val in = new BgzfBlockInput(raw, b0)
    var stopped = false
    if (start > 0L) {
      val first = in.readLine()
      // the discarded partial line may already drain past end — then the
      // whole split belongs to the previous reader
      if (first == null || first._2 >= end) stopped = true
    }
    new Iterator[String] {
      private var nextLine: String = advance()
      private def advance(): String = {
        if (stopped) { in.close(); return null }
        val l = in.readLine()
        if (l == null) { in.close(); return null }
        if (l._2 >= end) stopped = true // last owned line (drained past end)
        l._1
      }
      def hasNext: Boolean = nextLine != null
      def next(): String = { val r = nextLine; nextLine = advance(); r }
    }
  }

  /** Does this file start with a BGZF member (vs plain gzip / plain text)? */
  def isBgzf(header: Array[Byte]): Boolean =
    header.length >= 18 && (header(0) & 0xff) == 0x1f &&
      (header(1) & 0xff) == 0x8b && header(2) == 8 && (header(3) & 4) != 0 &&
      {
        val xlen = (header(10) & 0xff) | ((header(11) & 0xff) << 8)
        var i = 0
        var found = false
        while (i + 4 <= math.min(xlen, header.length - 12) && !found) {
          val slen = (header(12 + i + 2) & 0xff) | ((header(12 + i + 3) & 0xff) << 8)
          if (header(12 + i) == 'B' && header(12 + i + 1) == 'C' && slen == 2)
            found = true
          i += 4 + slen
        }
        found
      }

  /** Writes BGZF members of up to 64 KiB of payload. Close to flush the
    * final member + EOF marker. `writeEofOnClose=false` produces a
    * FRAGMENT (no EOF member) for binary concatenation — BGZF files are
    * valid when concatenated, which is how distributed single-file BAM
    * writes merge executor parts. */
  class BgzfOutputStream(out: OutputStream, writeEofOnClose: Boolean = true)
      extends OutputStream {
    private val buf = new Array[Byte](0xff00) // spec-recommended payload cap
    private var n = 0
    private var compressedWritten = 0L

    /** BAM virtual offset of the next byte to be written:
      * (compressed offset of the current block << 16) | in-block offset. */
    def virtualOffset: Long = (compressedWritten << 16) | n.toLong

    override def write(b: Int): Unit = {
      buf(n) = b.toByte; n += 1
      if (n == buf.length) flushBlock()
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off; var l = len
      while (l > 0) {
        val take = math.min(l, buf.length - n)
        System.arraycopy(b, o, buf, n, take)
        n += take; o += take; l -= take
        if (n == buf.length) flushBlock()
      }
    }

    private def flushBlock(): Unit = {
      if (n == 0) return
      val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      deflater.setInput(buf, 0, n)
      deflater.finish()
      val comp = new Array[Byte](buf.length + 64)
      var clen = 0
      while (!deflater.finished())
        clen += deflater.deflate(comp, clen, comp.length - clen)
      deflater.end()
      val crc = new CRC32
      crc.update(buf, 0, n)

      val bsize = clen + 26 // header(12) + extra(6) + footer(8)
      val h = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = h.write(v & 0xff)
      def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
      def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
      // gzip header with FEXTRA
      u8(0x1f); u8(0x8b); u8(8); u8(4); u32(0L); u8(0); u8(0xff)
      u16(6)               // XLEN
      u8('B'); u8('C'); u16(2); u16(bsize - 1)
      out.write(h.toByteArray)
      out.write(comp, 0, clen)
      val f = new java.io.ByteArrayOutputStream()
      def fu32(v: Long): Unit = { f.write(v.toInt & 0xff); f.write((v >> 8).toInt & 0xff); f.write((v >> 16).toInt & 0xff); f.write((v >> 24).toInt & 0xff) }
      fu32(crc.getValue)
      fu32(n.toLong)
      out.write(f.toByteArray)
      compressedWritten += 12 + 6 + clen + 8
      n = 0
    }

    override def flush(): Unit = { flushBlock(); out.flush() }
    override def close(): Unit = {
      flushBlock()
      if (writeEofOnClose) out.write(EofMarker)
      out.close()
    }
  }
}
