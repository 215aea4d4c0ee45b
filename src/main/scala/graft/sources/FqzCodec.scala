package graft.sources

import java.io.ByteArrayOutputStream

/** fqzcomp-style adaptive quality codec — the CRAM 3.1 quality-score
  * block method's MODEL (hts-specs CRAMcodecs "fqzcomp"): each quality
  * byte is arithmetic-coded under a context built from the recent quality
  * history and the position within the record, with per-context adaptive
  * frequency models ([[ArithCodec.Model]] over the carry-less range
  * coder). Quality strings are extremely context-predictable (neighboring
  * cycles correlate, error profiles drift along the read), which is why
  * the reference format family codes them this way rather than with
  * static tables.
  *
  * Simplification, documented (same round-trip-gated contract as the
  * other 3.1 codecs — no fixtures in this container): the published
  * format carries a configurable parameter block (selectors, context
  * mixing bits); this implementation fixes ONE documented parameter set:
  *
  * ```
  * ctx = (q[i-1] & 0x3f) << 6 | (q[i-2] & 0x3f) >> 2 << 2 | min(pos/32, 3)
  * ```
  *
  * i.e. 6 bits of the previous quality, 4 high bits of the one before,
  * 2 bits of coarse position — 4096 contexts. Record boundaries reset the
  * history (position/prev come from the CURRENT record only), which is
  * exactly what the per-record position context exists for.
  *
  * Frame: `uint7 nRecords | uint7 recordLen × n | uint7 totalLen |
  * range-coded payload`.
  */
object FqzCodec {

  private val PosBits = 2
  private val NCtx = 1 << (6 + 4 + PosBits)

  private def ctx(prev1: Int, prev2: Int, pos: Int): Int = {
    val p = math.min(pos >> 5, (1 << PosBits) - 1)
    (((prev1 & 0x3f) << 4) | ((prev2 & 0x3f) >> 2)) << PosBits | p
  }

  /** Compress per-record quality strings (record structure preserved). */
  def compress(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    RansNx16Codec.writeUint7(out, records.length)
    records.foreach(r => RansNx16Codec.writeUint7(out, r.length))
    RansNx16Codec.writeUint7(out, records.map(_.length).sum)
    val body = new ByteArrayOutputStream()
    val enc = new ArithCodec.RangeEncoder(body)
    val models = Array.fill(NCtx)(new ArithCodec.Model)
    records.foreach { rec =>
      var p1 = 0; var p2 = 0
      var i = 0
      while (i < rec.length) {
        val sym = rec(i) & 0xff
        val m = models(ctx(p1, p2, i))
        enc.encode(m.cumBefore(sym), m.freq(sym), m.total)
        m.update(sym)
        p2 = p1; p1 = sym
        i += 1
      }
    }
    enc.flush()
    val payload = body.toByteArray
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  def uncompress(stream: Array[Byte]): Seq[Array[Byte]] = {
    val pos = Array(0)
    val n = RansNx16Codec.readUint7(stream, pos)
    val lens = (0 until n).map(_ => RansNx16Codec.readUint7(stream, pos))
    RansNx16Codec.readUint7(stream, pos) // total (informational)
    val dec = new ArithCodec.RangeDecoder(stream, pos)
    val models = Array.fill(NCtx)(new ArithCodec.Model)
    lens.map { len =>
      val rec = new Array[Byte](len)
      var p1 = 0; var p2 = 0
      var i = 0
      while (i < len) {
        val m = models(ctx(p1, p2, i))
        val (sym, cum) = m.find(dec.decodeTarget(m.total))
        dec.decodeUpdate(cum, m.freq(sym), m.total)
        m.update(sym)
        rec(i) = sym.toByte
        p2 = p1; p1 = sym
        i += 1
      }
      rec
    }
  }

  /** CRAM QS-block adapter: the generic block interface sees only the
    * concatenated quality bytes (record lengths live in the RL series,
    * a different block), so the block is framed as ONE record — the
    * history contexts still adapt, only the per-record position reset is
    * forgone. Direct users with record structure call
    * [[compress(records*)]] instead. */
  def compressByteStream(data: Array[Byte]): Array[Byte] =
    compress(if (data.isEmpty) Seq.empty else Seq(data))

  def uncompressByteStream(stream: Array[Byte]): Array[Byte] =
    uncompress(stream).foldLeft(Array.emptyByteArray)(_ ++ _)
}
