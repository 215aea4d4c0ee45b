package graft.sources

import java.io.ByteArrayOutputStream

/** Read-name tokenizer codec — the CRAM 3.1 name-tokenizer method's
  * structure (hts-specs CRAMcodecs "Name tokenisation"): names are split
  * into typed tokens (digit runs, alpha runs, separators), each token
  * column is modeled against the SAME column of the PREVIOUS name (exact
  * match, small numeric delta, or literal), and every column stream is
  * entropy-coded independently with [[RansNx16Codec]] — so the highly
  * repetitive instrument/run/lane prefixes of real read names collapse to
  * near-zero cost and only the varying coordinates pay.
  *
  * Compatibility note: same contract as [[RansNx16Codec]] — no CRAM 3.1
  * fixtures exist in this container, so the codec is validated by
  * round-trip against itself (NameTokSpec) and by CRAM RN-block round
  * trips, not against htscodecs bytes. The token model (TYPE / STRING /
  * CHAR / DIGITS / DIGITS0 / DELTA / MATCH / DUP / END) follows the
  * published design; the serialization frame below is this codec's own,
  * documented here:
  *
  * ```
  * uint7 nNames | uint7 totalLen (names + '\n' separators)
  * per column stream: u8 colId | u8 kind | uint7 compLen | Nx16 payload
  * terminated by colId = 0xff
  * ```
  */
object NameTokCodec {

  // token types (one byte each in the TYPE stream)
  private val TDup = 0 // whole name identical to previous
  private val TMatch = 1 // token identical to previous name's token
  private val TString = 2 // literal non-digit run (in STRING stream)
  private val TChar = 3 // single literal char (in CHAR stream)
  private val TDigits = 4 // digit run w/o leading zero (u32 in DIGITS)
  private val TDigits0 = 5 // digit run with leading zeros (u32 + len)
  private val TDelta = 6 // digits, delta 0..255 vs prev token (DELTA)
  private val TEnd = 7 // end of name

  // per-column stream kinds
  private val KType = 0
  private val KString = 1
  private val KChar = 2
  private val KDigits = 3
  private val KDigitsLen = 4
  private val KDelta = 5

  private case class Tok(kind: Int, text: String) // kind: 0 other, 1 digits

  private def tokenize(name: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c.isDigit) {
        var j = i
        while (j < name.length && name.charAt(j).isDigit) j += 1
        out += Tok(1, name.substring(i, j))
        i = j
      } else if (c.isLetter) {
        var j = i
        while (j < name.length && name.charAt(j).isLetter) j += 1
        out += Tok(0, name.substring(i, j))
        i = j
      } else {
        out += Tok(0, name.substring(i, i + 1))
        i += 1
      }
    }
    out.result()
  }

  private class Streams {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[(Int, Int), ByteArrayOutputStream]
    def apply(col: Int, kind: Int): ByteArrayOutputStream =
      m.getOrElseUpdate((col, kind), new ByteArrayOutputStream())
  }

  private def writeU32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  /** Compress `names` (order preserved). */
  def compress(names: Seq[String]): Array[Byte] = {
    require(names.forall(n => !n.contains('\n')), "names cannot contain \\n")
    val streams = new Streams
    var prev: Vector[Tok] = Vector.empty
    var prevName: String = null
    names.foreach { name =>
      val toks = tokenize(name)
      if (prevName != null && name == prevName) {
        streams(0, KType).write(TDup)
      } else {
        var c = 0
        while (c < toks.length) {
          val t = toks(c)
          val col = c + 1 // column 0 reserved for the name-level stream
          val p = if (c < prev.length) prev(c) else null
          if (p != null && p == t) {
            streams(col, KType).write(TMatch)
          } else if (t.kind == 1 && p != null && p.kind == 1 &&
              t.text.length <= 9 && p.text.length <= 9 &&
              !t.text.startsWith("0") && !p.text.startsWith("0") &&
              t.text.toLong - p.text.toLong >= 0 &&
              t.text.toLong - p.text.toLong <= 255) {
            streams(col, KType).write(TDelta)
            streams(col, KDelta).write((t.text.toLong - p.text.toLong).toInt)
          } else if (t.kind == 1 && t.text.length <= 9 &&
              !t.text.startsWith("0")) {
            streams(col, KType).write(TDigits)
            writeU32(streams(col, KDigits), t.text.toLong)
          } else if (t.kind == 1 && t.text.length <= 9) {
            streams(col, KType).write(TDigits0)
            writeU32(streams(col, KDigits), t.text.toLong)
            streams(col, KDigitsLen).write(t.text.length)
          } else if (t.text.length == 1) {
            streams(col, KType).write(TChar)
            streams(col, KChar).write(t.text.charAt(0))
          } else {
            streams(col, KType).write(TString)
            val b = t.text.getBytes("UTF-8")
            streams(col, KString).write(b, 0, b.length)
            streams(col, KString).write(0)
          }
          c += 1
        }
        streams(0, KType).write(TEnd) // name-level: "tokens follow" marker
        streams(c + 1, KType).write(TEnd)
      }
      prev = toks
      prevName = name
    }
    val out = new ByteArrayOutputStream()
    RansNx16Codec.writeUint7(out, names.length)
    RansNx16Codec.writeUint7(out,
      names.map(_.length + 1).sum) // incl '\n' separators
    streams.m.foreach { case ((col, kind), s) =>
      val payload = RansNx16Codec.compress(s.toByteArray, 0)
      out.write(col); out.write(kind)
      RansNx16Codec.writeUint7(out, payload.length)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff)
    out.toByteArray
  }

  private class Reader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u32(): Long = {
      val v = (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
        ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)
      pos += 4
      v
    }
    def done: Boolean = pos >= b.length
  }

  def uncompress(stream: Array[Byte]): Seq[String] = {
    val pos = Array(0)
    val nNames = RansNx16Codec.readUint7(stream, pos)
    RansNx16Codec.readUint7(stream, pos) // totalLen (informational)
    val cols = scala.collection.mutable.Map.empty[(Int, Int), Reader]
    while ((stream(pos(0)) & 0xff) != 0xff) {
      val col = stream(pos(0)) & 0xff
      val kind = stream(pos(0) + 1) & 0xff
      pos(0) += 2
      val clen = RansNx16Codec.readUint7(stream, pos)
      val payload = java.util.Arrays.copyOfRange(stream, pos(0), pos(0) + clen)
      pos(0) += clen
      cols((col, kind)) = new Reader(RansNx16Codec.uncompress(payload))
    }
    def rd(col: Int, kind: Int): Reader = cols((col, kind))
    val names = new Array[String](nNames)
    var prev: Vector[Tok] = Vector.empty
    var prevName: String = null
    var i = 0
    while (i < nNames) {
      val nameLevel = rd(0, KType).u8()
      if (nameLevel == TDup) {
        names(i) = prevName
      } else {
        val toks = Vector.newBuilder[Tok]
        var c = 0
        var endSeen = false
        while (!endSeen) {
          val col = c + 1
          val t = rd(col, KType).u8()
          t match {
            case TEnd => endSeen = true
            case TMatch => toks += prev(c)
            case TDelta =>
              val d = rd(col, KDelta).u8()
              toks += Tok(1, (prev(c).text.toLong + d).toString)
            case TDigits =>
              toks += Tok(1, rd(col, KDigits).u32().toString)
            case TDigits0 =>
              val v = rd(col, KDigits).u32()
              val l = rd(col, KDigitsLen).u8()
              toks += Tok(1, ("%0" + l + "d").format(v))
            case TChar =>
              toks += Tok(0, rd(col, KChar).u8().toChar.toString)
            case TString =>
              val sb = new StringBuilder
              val r = rd(col, KString)
              var ch = r.u8()
              while (ch != 0) { sb.append(ch.toChar); ch = r.u8() }
              toks += Tok(0, sb.toString)
            case other => sys.error(s"bad token type $other")
          }
          if (!endSeen) c += 1
        }
        val ts = toks.result()
        names(i) = ts.map(_.text).mkString
        prev = ts
      }
      prevName = names(i)
      i += 1
    }
    names.toSeq
  }

  /** CRAM RN-block adapter: the block payload is names each terminated by
    * `stop` (the BYTE_ARRAY_STOP series layout); round trips through the
    * tokenizer. */
  def compressByteStream(data: Array[Byte], stop: Byte): Array[Byte] = {
    val s = new String(data, "UTF-8")
    val names =
      if (s.isEmpty) Seq.empty[String]
      else s.split(stop.toChar.toString, -1).toSeq.dropRight(1)
    compress(names)
  }

  def uncompressByteStream(stream: Array[Byte], stop: Byte): Array[Byte] = {
    val names = uncompress(stream)
    val out = new ByteArrayOutputStream()
    names.foreach { n =>
      val b = n.getBytes("UTF-8")
      out.write(b, 0, b.length)
      out.write(stop)
    }
    out.toByteArray
  }
}
