package graft.sources

import java.io.ByteArrayOutputStream

/** Adaptive arithmetic (range) coder — the CRAM 3.1 "adaptive arithmetic
  * coding" block method (hts-specs CRAMcodecs; htscodecs arith_dynamic):
  * a carry-less 32-bit range coder driven by per-symbol ADAPTIVE
  * frequency models (counts increment as symbols are seen, halving when
  * the total saturates), with order-0 or order-1 (previous byte) contexts
  * and the same outer transforms as [[RansNx16Codec]] (CAT for
  * incompressible data; sizes as uint7).
  *
  * Unlike the static-table rANS methods, no frequency table is stored:
  * encoder and decoder grow identical models symbol by symbol, so highly
  * non-stationary streams (quality strings, per-tile drift) code closer
  * to their local entropy.
  *
  * Compatibility contract: same as [[RansNx16Codec]] / [[NameTokCodec]] —
  * validated by round trip (no CRAM 3.1 fixtures exist in this
  * container); flag bits mirror the Nx16 layout (0x01 ORDER1, 0x10 NOSZ,
  * 0x20 CAT), and the model/coder parameters below are this codec's own
  * documented choice: increment 32, rescale at total >= 2^13, range
  * renormalizes a byte at a time while the top byte of low/high agree.
  */
object ArithCodec {

  val Order1 = 0x01
  val Nosz = 0x10
  val Cat = 0x20

  private val Inc = 32
  private val MaxTotal = 1 << 13

  /** Adaptive order-0 model over 256 symbols (+1 smoothing). */
  private[sources] final class Model {
    val freq = Array.fill(256)(1)
    var total = 256
    def update(sym: Int): Unit = {
      freq(sym) += Inc
      total += Inc
      if (total >= MaxTotal) {
        var t = 0
        var i = 0
        while (i < 256) {
          freq(i) = (freq(i) + 1) >> 1
          t += freq(i)
          i += 1
        }
        total = t
      }
    }
    def cumBefore(sym: Int): Int = {
      var c = 0
      var i = 0
      while (i < sym) { c += freq(i); i += 1 }
      c
    }
    def find(target: Int): (Int, Int) = { // (sym, cumBefore)
      var c = 0
      var i = 0
      while (c + freq(i) <= target) { c += freq(i); i += 1 }
      (i, c)
    }
  }

  // Subbotin carry-less range coder: 32-bit low/range; a byte settles
  // (top bytes of low and low+range agree) or an underflow forces range
  // truncation — both proven-correct classic rules, no carry propagation
  // into emitted bytes by construction.
  private val Top = 1L << 24
  private val Bot = 1L << 16
  private val M32 = 0xFFFFFFFFL

  private[sources] final class RangeEncoder(out: ByteArrayOutputStream) {
    private var low = 0L
    private var range = M32
    def encode(cumFreq: Int, freq: Int, total: Int): Unit = {
      val r = range / total
      low = (low + r * cumFreq) & M32
      range = r * freq
      normalize()
    }
    private def normalize(): Unit = {
      var go = true
      while (go) {
        if (((low ^ (low + range)) & M32) < Top) {
          out.write(((low >>> 24) & 0xff).toInt)
          low = (low << 8) & M32
          range = (range << 8) & M32
        } else if (range < Bot) {
          range = (0L - low) & (Bot - 1)
          out.write(((low >>> 24) & 0xff).toInt)
          low = (low << 8) & M32
          range = (range << 8) & M32
        } else go = false
      }
    }
    def flush(): Unit = {
      var i = 0
      while (i < 4) {
        out.write(((low >>> 24) & 0xff).toInt)
        low = (low << 8) & M32
        i += 1
      }
    }
  }

  private[sources] final class RangeDecoder(b: Array[Byte], val pos: Array[Int]) {
    private var low = 0L
    private var range = M32
    private var code = 0L
    locally {
      var i = 0
      while (i < 4) { code = ((code << 8) | nextByte()) & M32; i += 1 }
    }
    private def nextByte(): Int =
      if (pos(0) < b.length) { val v = b(pos(0)) & 0xff; pos(0) += 1; v }
      else 0
    def decodeTarget(total: Int): Int = {
      val r = range / total
      math.min(total - 1, (((code - low) & M32) / r).toInt)
    }
    def decodeUpdate(cumFreq: Int, freq: Int, total: Int): Unit = {
      val r = range / total
      low = (low + r * cumFreq) & M32
      range = r * freq
      var go = true
      while (go) {
        if (((low ^ (low + range)) & M32) < Top) {
          code = ((code << 8) | nextByte()) & M32
          low = (low << 8) & M32
          range = (range << 8) & M32
        } else if (range < Bot) {
          range = (0L - low) & (Bot - 1)
          code = ((code << 8) | nextByte()) & M32
          low = (low << 8) & M32
          range = (range << 8) & M32
        } else go = false
      }
    }
  }

  def compress(data: Array[Byte], flags: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    val body = new ByteArrayOutputStream()
    val enc = new RangeEncoder(body)
    if ((flags & Order1) != 0) {
      val models = Array.fill(256)(new Model)
      var ctx = 0
      var i = 0
      while (i < data.length) {
        val sym = data(i) & 0xff
        val m = models(ctx)
        enc.encode(m.cumBefore(sym), m.freq(sym), m.total)
        m.update(sym)
        ctx = sym
        i += 1
      }
    } else {
      val m = new Model
      var i = 0
      while (i < data.length) {
        val sym = data(i) & 0xff
        enc.encode(m.cumBefore(sym), m.freq(sym), m.total)
        m.update(sym)
        i += 1
      }
    }
    enc.flush()
    val payload = body.toByteArray
    if (payload.length >= data.length) {
      out.write(Cat)
      RansNx16Codec.writeUint7(out, data.length)
      out.write(data, 0, data.length)
    } else {
      out.write(flags & Order1)
      RansNx16Codec.writeUint7(out, data.length)
      out.write(payload, 0, payload.length)
    }
    out.toByteArray
  }

  def uncompress(stream: Array[Byte]): Array[Byte] = {
    val pos = Array(0)
    val flags = stream(pos(0)) & 0xff
    pos(0) += 1
    val rawSize =
      if ((flags & Nosz) == 0) RansNx16Codec.readUint7(stream, pos)
      else sys.error("NOSZ arith streams need an external size")
    if ((flags & Cat) != 0)
      return java.util.Arrays.copyOfRange(stream, pos(0), pos(0) + rawSize)
    val out = new Array[Byte](rawSize)
    val dec = new RangeDecoder(stream, pos)
    if ((flags & Order1) != 0) {
      val models = Array.fill(256)(new Model)
      var ctx = 0
      var i = 0
      while (i < rawSize) {
        val m = models(ctx)
        val (sym, cum) = m.find(dec.decodeTarget(m.total))
        dec.decodeUpdate(cum, m.freq(sym), m.total)
        m.update(sym)
        out(i) = sym.toByte
        ctx = sym
        i += 1
      }
    } else {
      val m = new Model
      var i = 0
      while (i < rawSize) {
        val (sym, cum) = m.find(dec.decodeTarget(m.total))
        dec.decodeUpdate(cum, m.freq(sym), m.total)
        m.update(sym)
        out(i) = sym.toByte
        i += 1
      }
    }
    out
  }
}
