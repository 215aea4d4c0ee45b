package graft.sources

import java.io.ByteArrayOutputStream

/** rANS 4x8 entropy codec from the public CRAM 3.0 specification
  * (hts-specs "rANS codec"): byte-wise range asymmetric numeral system
  * with 4 interleaved states, 12-bit normalized frequencies, order-0 and
  * order-1 contexts. Both directions are implemented so the decoder is
  * validated by round-trip against our own encoder (no external fixtures
  * in this environment).
  *
  * Stream layout: 1 byte order | 4 bytes LE compressed size (of what
  * follows) | 4 bytes LE raw size | frequency table | 4 (order-0) or 4
  * (order-1, one per quarter) uint32 LE initial states + interleaved
  * renormalization bytes.
  */
object RansCodec {

  private val TfShift = 12
  private val TotFreq = 1 << TfShift // 4096
  private val RansByteL = 1 << 23

  // --------------------------- frequency tables ----------------------------

  /** Normalize counts so they sum to TotFreq with every present symbol
    * keeping freq >= 1. */
  private def normalize(counts: Array[Long]): Array[Int] = {
    val total = counts.sum
    val out = new Array[Int](256)
    if (total == 0) return out
    var sum = 0
    var maxIdx = 0
    var i = 0
    while (i < 256) {
      if (counts(i) > 0) {
        val f = math.max(1, ((counts(i) * TotFreq) / total).toInt)
        out(i) = f
        sum += f
        if (counts(i) > counts(maxIdx) || out(maxIdx) == 0) maxIdx = i
      }
      i += 1
    }
    // fix rounding drift on the most frequent symbol
    val drift = TotFreq - sum
    out(maxIdx) += drift
    if (out(maxIdx) < 1) { // pathological: redistribute
      var need = 1 - out(maxIdx)
      out(maxIdx) = 1
      var j = 0
      while (need > 0 && j < 256) {
        if (j != maxIdx && out(j) > 1) { val take = math.min(out(j) - 1, need); out(j) -= take; need -= take }
        j += 1
      }
    }
    out
  }

  private def writeFreq(out: ByteArrayOutputStream, f: Int): Unit =
    if (f < 128) out.write(f)
    else { out.write(0x80 | (f >> 8)); out.write(f & 0xff) }

  private def readFreq(b: Array[Byte], pos: Array[Int]): Int = {
    val b0 = b(pos(0)) & 0xff; pos(0) += 1
    if (b0 < 0x80) b0
    else { val b1 = b(pos(0)) & 0xff; pos(0) += 1; ((b0 & 0x7f) << 8) | b1 }
  }

  /** Symbol table with the spec's ascending-run RLE. */
  private def writeFreqTable(out: ByteArrayOutputStream, freqs: Array[Int]): Unit = {
    var rle = 0
    var j = 0
    while (j < 256) {
      if (freqs(j) != 0) {
        if (rle > 0) rle -= 1
        else {
          out.write(j)
          if (j > 0 && freqs(j - 1) != 0) {
            // count the run of further present consecutive symbols
            rle = 0
            var k = j + 1
            while (k < 256 && freqs(k) != 0) { rle += 1; k += 1 }
            out.write(rle)
          }
        }
        writeFreq(out, freqs(j))
      }
      j += 1
    }
    out.write(0) // terminator
  }

  /** Canonical spec decoder loop: read sym; { read F[sym]; next sym =
    * explicit byte, or peeked run start (sym+1 followed by run length), or
    * implicit +1 inside a run } until the 0 terminator. */
  private def readFreqTable(b: Array[Byte], pos: Array[Int]): Array[Int] = {
    val freqs = new Array[Int](256)
    var rle = 0
    var j = b(pos(0)) & 0xff; pos(0) += 1
    var continue = true
    while (continue) {
      freqs(j) = readFreq(b, pos)
      if (rle == 0 && pos(0) < b.length && (b(pos(0)) & 0xff) == j + 1) {
        j = b(pos(0)) & 0xff; pos(0) += 1
        rle = b(pos(0)) & 0xff; pos(0) += 1
      } else if (rle > 0) {
        rle -= 1
        j += 1
      } else {
        j = b(pos(0)) & 0xff; pos(0) += 1
      }
      if (j == 0) continue = false
    }
    freqs
  }

  private def cumulative(freqs: Array[Int]): Array[Int] = {
    val cum = new Array[Int](257)
    var i = 0
    while (i < 256) { cum(i + 1) = cum(i) + freqs(i); i += 1 }
    cum
  }

  /** symbol-of-slot lookup table (4096 entries). */
  private def slotTable(freqs: Array[Int]): Array[Byte] = {
    val t = new Array[Byte](TotFreq)
    var i = 0
    var s = 0
    while (s < 256) {
      var k = 0
      while (k < freqs(s)) { t(i) = s.toByte; i += 1; k += 1 }
      s += 1
    }
    t
  }

  // ------------------------------- order 0 ---------------------------------

  private def encodeO0(data: Array[Byte]): Array[Byte] = {
    val counts = new Array[Long](256)
    data.foreach(b => counts(b & 0xff) += 1)
    val freqs = normalize(counts)
    val cum = cumulative(freqs)

    val tbl = new ByteArrayOutputStream()
    writeFreqTable(tbl, freqs)

    // encode back-to-front; renorm bytes collected reversed
    val states = Array.fill(4)(RansByteL.toLong)
    val rev = new ByteArrayOutputStream()
    var i = data.length - 1
    while (i >= 0) {
      val j = i % 4
      val s = data(i) & 0xff
      val f = freqs(s)
      var x = states(j)
      val xMax = ((RansByteL.toLong >> TfShift) << 8) * f
      while (x >= xMax) { rev.write((x & 0xff).toInt); x >>= 8 }
      states(j) = (x / f) * TotFreq + (x % f) + cum(s)
      i -= 1
    }
    val out = new ByteArrayOutputStream()
    var j = 0
    while (j < 4) {
      val x = states(j)
      out.write((x & 0xff).toInt); out.write(((x >> 8) & 0xff).toInt)
      out.write(((x >> 16) & 0xff).toInt); out.write(((x >> 24) & 0xff).toInt)
      j += 1
    }
    val revBytes = rev.toByteArray
    var k = revBytes.length - 1
    while (k >= 0) { out.write(revBytes(k)); k -= 1 }
    tbl.toByteArray ++ out.toByteArray
  }

  private def decodeO0(b: Array[Byte], pos: Array[Int], rawSize: Int): Array[Byte] = {
    val freqs = readFreqTable(b, pos)
    val cum = cumulative(freqs)
    val slots = slotTable(freqs)
    val states = new Array[Long](4)
    var j = 0
    while (j < 4) {
      states(j) = (b(pos(0)) & 0xffL) | ((b(pos(0) + 1) & 0xffL) << 8) |
        ((b(pos(0) + 2) & 0xffL) << 16) | ((b(pos(0) + 3) & 0xffL) << 24)
      pos(0) += 4
      j += 1
    }
    val out = new Array[Byte](rawSize)
    var i = 0
    while (i < rawSize) {
      val k = i % 4
      var x = states(k)
      val slot = (x & (TotFreq - 1)).toInt
      val s = slots(slot) & 0xff
      out(i) = s.toByte
      x = freqs(s) * (x >> TfShift) + slot - cum(s)
      while (x < RansByteL && pos(0) < b.length) {
        x = (x << 8) | (b(pos(0)) & 0xffL); pos(0) += 1
      }
      states(k) = x
      i += 1
    }
    out
  }

  // ------------------------------- order 1 ---------------------------------

  private def encodeO1(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val counts = Array.ofDim[Long](256, 256)
    // quarters: each stream encodes a contiguous segment; segment starts
    // use context 0
    val q = n / 4
    val starts = Array(0, q, 2 * q, 3 * q)
    val ends = Array(q, 2 * q, 3 * q, n)
    var seg = 0
    while (seg < 4) {
      var last = 0
      var i = starts(seg)
      while (i < ends(seg)) {
        counts(last)(data(i) & 0xff) += 1
        last = data(i) & 0xff
        i += 1
      }
      seg += 1
    }
    val freqs = new Array[Array[Int]](256)
    val cums = new Array[Array[Int]](256)
    var c = 0
    while (c < 256) {
      freqs(c) = normalize(counts(c))
      cums(c) = cumulative(freqs(c))
      c += 1
    }

    // table: outer RLE over contexts with any data, inner order-0 table
    val tbl = new ByteArrayOutputStream()
    val present = (0 until 256).map(ci => counts(ci).exists(_ > 0)).toArray
    var rle = 0
    var ci = 0
    while (ci < 256) {
      if (present(ci)) {
        if (rle > 0) rle -= 1
        else {
          tbl.write(ci)
          if (ci > 0 && present(ci - 1)) {
            rle = 0
            var k = ci + 1
            while (k < 256 && present(k)) { rle += 1; k += 1 }
            tbl.write(rle)
          }
        }
        writeFreqTable(tbl, freqs(ci))
      }
      ci += 1
    }
    tbl.write(0)

    // encode each segment back-to-front with its own state
    val states = Array.fill(4)(RansByteL.toLong)
    val rev = new ByteArrayOutputStream()
    // interleaved renormalization order must mirror the decoder: decoder
    // pulls bytes for stream j as it needs them while scanning segments in
    // parallel position order. To keep enc/dec in lockstep we encode
    // streams in reverse position order round-robin over the farthest
    // position first — equivalently: iterate global step from max segment
    // length - 1 down to 0, and within a step, stream 3 down to 0.
    val segLen = Array.tabulate(4)(s => ends(s) - starts(s))
    val maxLen = segLen.max
    var step = maxLen - 1
    while (step >= 0) {
      var s = 3
      while (s >= 0) {
        if (step < segLen(s)) {
          val i = starts(s) + step
          val ctx = if (step == 0) 0 else data(i - 1) & 0xff
          val sym = data(i) & 0xff
          val f = freqs(ctx)(sym)
          var x = states(s)
          val xMax = ((RansByteL.toLong >> TfShift) << 8) * f
          while (x >= xMax) { rev.write((x & 0xff).toInt); x >>= 8 }
          states(s) = (x / f) * TotFreq + (x % f) + cums(ctx)(sym)
        }
        s -= 1
      }
      step -= 1
    }
    val out = new ByteArrayOutputStream()
    var j = 0
    while (j < 4) {
      val x = states(j)
      out.write((x & 0xff).toInt); out.write(((x >> 8) & 0xff).toInt)
      out.write(((x >> 16) & 0xff).toInt); out.write(((x >> 24) & 0xff).toInt)
      j += 1
    }
    val revBytes = rev.toByteArray
    var k = revBytes.length - 1
    while (k >= 0) { out.write(revBytes(k)); k -= 1 }
    tbl.toByteArray ++ out.toByteArray
  }

  private def decodeO1(b: Array[Byte], pos: Array[Int], rawSize: Int): Array[Byte] = {
    val freqs = Array.fill(256)(null: Array[Int])
    val cums = Array.fill(256)(null: Array[Int])
    val slots = Array.fill(256)(null: Array[Byte])
    // outer context table: same canonical sym/run loop as the inner tables
    var rle = 0
    var j = b(pos(0)) & 0xff; pos(0) += 1
    var continue = true
    while (continue) {
      val f = readFreqTable(b, pos)
      freqs(j) = f
      cums(j) = cumulative(f)
      slots(j) = slotTable(f)
      if (rle == 0 && pos(0) < b.length && (b(pos(0)) & 0xff) == j + 1) {
        j = b(pos(0)) & 0xff; pos(0) += 1
        rle = b(pos(0)) & 0xff; pos(0) += 1
      } else if (rle > 0) {
        rle -= 1
        j += 1
      } else {
        j = b(pos(0)) & 0xff; pos(0) += 1
      }
      if (j == 0) continue = false
    }
    val empty = new Array[Int](256)
    var ci = 0
    while (ci < 256) {
      if (freqs(ci) == null) {
        freqs(ci) = empty; cums(ci) = cumulative(empty)
        slots(ci) = slotTable(empty)
      }
      ci += 1
    }

    val n = rawSize
    val q = n / 4
    val starts = Array(0, q, 2 * q, 3 * q)
    val ends = Array(q, 2 * q, 3 * q, n)
    val segLen = Array.tabulate(4)(s => ends(s) - starts(s))
    val states = new Array[Long](4)
    var st = 0
    while (st < 4) {
      states(st) = (b(pos(0)) & 0xffL) | ((b(pos(0) + 1) & 0xffL) << 8) |
        ((b(pos(0) + 2) & 0xffL) << 16) | ((b(pos(0) + 3) & 0xffL) << 24)
      pos(0) += 4
      st += 1
    }
    val out = new Array[Byte](n)
    val maxLen = segLen.max
    var step = 0
    while (step < maxLen) {
      var s = 0
      while (s < 4) {
        if (step < segLen(s)) {
          val i = starts(s) + step
          val ctx = if (step == 0) 0 else out(i - 1) & 0xff
          var x = states(s)
          val slot = (x & (TotFreq - 1)).toInt
          val symb = slots(ctx)(slot) & 0xff
          out(i) = symb.toByte
          x = freqs(ctx)(symb) * (x >> TfShift) + slot - cums(ctx)(symb)
          while (x < RansByteL && pos(0) < b.length) {
            x = (x << 8) | (b(pos(0)) & 0xffL); pos(0) += 1
          }
          states(s) = x
        }
        s += 1
      }
      step += 1
    }
    out
  }

  // -------------------------------- api ------------------------------------

  def compress(data: Array[Byte], order: Int): Array[Byte] = {
    require(order == 0 || order == 1)
    val body =
      if (data.isEmpty) Array.emptyByteArray
      else if (order == 0) encodeO0(data)
      else encodeO1(data)
    val out = new ByteArrayOutputStream(body.length + 9)
    out.write(order)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(body.length)
    w32(data.length)
    out.write(body)
    out.toByteArray
  }

  def uncompress(stream: Array[Byte]): Array[Byte] = {
    val order = stream(0) & 0xff
    def r32(o: Int): Int =
      (stream(o) & 0xff) | ((stream(o + 1) & 0xff) << 8) |
        ((stream(o + 2) & 0xff) << 16) | ((stream(o + 3) & 0xff) << 24)
    val rawSize = r32(5)
    if (rawSize == 0) return Array.emptyByteArray
    val pos = Array(9)
    if (order == 0) decodeO0(stream, pos, rawSize)
    else decodeO1(stream, pos, rawSize)
  }
}
