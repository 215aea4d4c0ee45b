package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, GZIPInputStream}

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

  /** Writes BGZF members of up to 64 KiB of payload. Close to flush the
    * final member + EOF marker. */
  class BgzfOutputStream(out: OutputStream) extends OutputStream {
    private val buf = new Array[Byte](0xff00) // spec-recommended payload cap
    private var n = 0

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
      n = 0
    }

    override def flush(): Unit = { flushBlock(); out.flush() }
    override def close(): Unit = {
      flushBlock()
      out.write(EofMarker)
      out.close()
    }
  }
}
