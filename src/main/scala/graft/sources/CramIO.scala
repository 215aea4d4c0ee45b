package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.{CRC32, Deflater, GZIPInputStream, GZIPOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Encoders, SparkSession}
import graft.core.GenomicDataset
import graft.model._

/** CRAM 3.0 container IO, from the public CRAM specification (the
  * reference reads CRAM through htsjdk, ADAMContext loadBam dispatch —
  * absent here, so this is a from-spec implementation of a documented
  * SUBSET):
  *
  *  - container / block / slice structure with itf8/ltf8 varints and CRCs;
  *  - block methods raw, gzip, and rANS 4x8 ([[RansCodec]], validated by
  *    round-trip);
  *  - all data series in EXTERNAL blocks (a legal encoding choice the
  *    writer declares in the compression header); reads decode EXTERNAL,
  *    BYTE_ARRAY_STOP, and constant single-symbol HUFFMAN encodings and
  *    reject others with a clear error;
  *  - referenceless profile (preservation RR=false): mapped reads carry
  *    their bases as read features ('b'/'S'/'I'/'D'/'N'/'H'/'P'), so no
  *    reference is needed in either direction. '='/'X' CIGAR ops collapse
  *    to M on round trip;
  *  - tags of types A/i/f/Z via the TD tag dictionary + per-tag external
  *    blocks.
  *
  * Write is driver-streamed (like indexed BAM writes); read parallelizes
  * per CONTAINER: the driver scans container offsets (headers only, no
  * payload decompression) and executors decode containers independently.
  */
object CramIO {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
    Encoders.product[Alignment]

  private val Magic = Array[Byte]('C', 'R', 'A', 'M', 3, 0)

  /** The CRAM 3.0 spec's literal 38-byte EOF container (section 9 of the
    * specification; validated byte-for-byte by htsjdk/samtools). */
  private val EofContainer: Array[Byte] = Array(
    0x0f, 0x00, 0x00, 0x00, // container length 15
    0xff, 0xff, 0xff, 0xff, 0x0f, // refSeqId -1 (itf8)
    0xe0, 0x45, 0x4f, 0x46, // alignmentStart 4542278 ("EOF")
    0x00, // alignmentSpan 0
    0x00, // nRecords 0
    0x00, // recordCounter 0 (ltf8)
    0x00, // bases 0 (ltf8)
    0x01, // nBlocks 1
    0x00, // nLandmarks 0
    0x05, 0xbd, 0xd9, 0x4f, // header CRC32
    0x00, 0x01, 0x00, 0x06, 0x06, // block: raw, comp-header, id 0, 6/6
    0x01, 0x00, 0x01, 0x00, 0x01, 0x00, // empty compression header
    0xee, 0x63, 0x01, 0x4b // block CRC32
  ).map(_.toByte)

  // ------------------------------ varints ----------------------------------

  private[sources] def writeItf8(out: ByteArrayOutputStream, v0: Int): Unit = {
    val v = v0
    if ((v >> 7) == 0 && v >= 0) out.write(v)
    else if ((v >> 14) == 0 && v >= 0) {
      out.write(0x80 | (v >> 8)); out.write(v & 0xff)
    } else if ((v >> 21) == 0 && v >= 0) {
      out.write(0xc0 | (v >> 16)); out.write((v >> 8) & 0xff); out.write(v & 0xff)
    } else if ((v >> 28) == 0 && v >= 0) {
      out.write(0xe0 | (v >> 24)); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    } else {
      out.write(0xf0 | ((v >> 28) & 0x0f)); out.write((v >> 20) & 0xff)
      out.write((v >> 12) & 0xff); out.write((v >> 4) & 0xff); out.write(v & 0x0f)
    }
  }

  private[sources] def readItf8(in: InputStream): Int = {
    val b0 = in.read()
    if (b0 < 0) throw new EOFException("itf8")
    if ((b0 & 0x80) == 0) b0
    else if ((b0 & 0x40) == 0) ((b0 & 0x3f) << 8) | in.read()
    else if ((b0 & 0x20) == 0)
      ((b0 & 0x1f) << 16) | (in.read() << 8) | in.read()
    else if ((b0 & 0x10) == 0)
      ((b0 & 0x0f) << 24) | (in.read() << 16) | (in.read() << 8) | in.read()
    else
      ((b0 & 0x0f) << 28) | (in.read() << 20) | (in.read() << 12) |
        (in.read() << 4) | (in.read() & 0x0f)
  }

  private[sources] def writeLtf8(out: ByteArrayOutputStream, v: Long): Unit = {
    // always the maximal 9-byte form (legal for any value; readers accept
    // all prefix lengths)
    out.write(0xff)
    var k = 7
    while (k >= 0) { out.write(((v >> (8 * k)) & 0xff).toInt); k -= 1 }
  }

  private[sources] def readLtf8(in: InputStream): Long = {
    val b0 = in.read()
    if (b0 < 0) throw new EOFException("ltf8")
    var extra = 0
    var mask = 0x80
    while (extra < 8 && (b0 & mask) != 0) { extra += 1; mask >>= 1 }
    if (extra == 0) return b0.toLong
    var v: Long =
      if (extra == 8) 0L else (b0 & ((1 << (7 - extra)) - 1)).toLong
    var k = 0
    while (k < extra) { v = (v << 8) | in.read(); k += 1 }
    v
  }

  // ------------------------------- blocks ----------------------------------

  private val MethodRaw = 0
  private val MethodGzip = 1
  private val MethodRans = 4

  /** InputStream.skip may short-skip (Hadoop streams do); loop to the
    * requested count. */
  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() < 0) throw new EOFException("skip")
      else left -= 1
    }
  }

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos) {
      this.`def`.setLevel(Deflater.DEFAULT_COMPRESSION)
    }
    gz.write(data); gz.close()
    bos.toByteArray
  }

  private def gunzip(data: Array[Byte], rawSize: Int): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(data))
    val out = new Array[Byte](rawSize)
    var o = 0
    while (o < rawSize) {
      val r = in.read(out, o, rawSize - o)
      if (r < 0) throw new EOFException("gzip block")
      o += r
    }
    out
  }

  private case class Block(contentType: Int, contentId: Int, data: Array[Byte])

  private def writeBlock(out: ByteArrayOutputStream, b: Block,
      method: Int = MethodGzip): Unit = {
    val (m, payload) =
      if (b.data.isEmpty) (MethodRaw, b.data)
      else method match {
        case MethodGzip => (MethodGzip, gzip(b.data))
        case MethodRans => (MethodRans, RansCodec.compress(b.data, 1))
        case _ => (MethodRaw, b.data)
      }
    val hdr = new ByteArrayOutputStream()
    hdr.write(m); hdr.write(b.contentType)
    writeItf8(hdr, b.contentId)
    writeItf8(hdr, payload.length)
    writeItf8(hdr, b.data.length)
    val body = hdr.toByteArray ++ payload
    out.write(body, 0, body.length)
    val crc = new CRC32
    crc.update(body)
    val c = crc.getValue
    out.write((c & 0xff).toInt); out.write(((c >> 8) & 0xff).toInt)
    out.write(((c >> 16) & 0xff).toInt); out.write(((c >> 24) & 0xff).toInt)
  }

  private def readBlock(in: InputStream): Block = {
    val method = in.read()
    val contentType = in.read()
    val contentId = readItf8(in)
    val compSize = readItf8(in)
    val rawSize = readItf8(in)
    val payload = new Array[Byte](compSize)
    var o = 0
    while (o < compSize) {
      val r = in.read(payload, o, compSize - o)
      if (r < 0) throw new EOFException("block payload")
      o += r
    }
    skipFully(in, 4) // block CRC (verified structurally by decode)
    val data = method match {
      case MethodRaw => payload
      case MethodGzip => gunzip(payload, rawSize)
      case MethodRans => RansCodec.uncompress(payload)
      case other =>
        throw new UnsupportedOperationException(
          s"CRAM block compression method $other not supported " +
            "(supported: raw, gzip, rANS 4x8)")
    }
    Block(contentType, contentId, data)
  }

  // --------------------------- data series ids -----------------------------

  private val SeriesIds: Map[String, Int] = Map(
    "BF" -> 1, "CF" -> 2, "RI" -> 3, "RL" -> 4, "AP" -> 5, "RG" -> 6,
    "RN" -> 7, "MF" -> 8, "NS" -> 9, "NP" -> 10, "TS" -> 11, "TL" -> 12,
    "FN" -> 13, "FC" -> 14, "FP" -> 15, "DL" -> 16, "BB" -> 17, "SC" -> 18,
    "IN" -> 19, "RS" -> 20, "HC" -> 21, "PD" -> 22, "MQ" -> 23, "BA" -> 24,
    "QS" -> 25)
  private val EncExternal = 1
  private val EncHuffman = 3
  private val EncByteArrayStop = 5
  private val EncBeta = 6

  // ------------------------ encodings / bit io -----------------------------

  /** A data-series encoding, as declared in the compression header.
    * EXTERNAL/BYTE_ARRAY_STOP read byte streams; BETA and HUFFMAN read the
    * shared CORE bit stream (MSB-first); a zero-bit single-symbol HUFFMAN
    * is a constant. */
  private sealed trait SeriesEnc
  private case class ExtEnc(id: Int) extends SeriesEnc
  private case class StopEnc(stop: Byte, id: Int) extends SeriesEnc
  private case class ConstEnc(value: Int) extends SeriesEnc
  private case class BetaEnc(offset: Int, nbits: Int) extends SeriesEnc
  private case class HuffEnc(symbols: Array[Int], lens: Array[Int]) extends SeriesEnc {
    /** canonical codes: symbols ranked by (len, symbol value) — the spec's
      * canonical order, independent of declaration order. */
    lazy val codes: Array[Int] = {
      val order = symbols.indices.sortBy(i => (lens(i), symbols(i)))
      val out = new Array[Int](symbols.length)
      var code = 0
      var prevLen = 0
      order.foreach { i =>
        code = if (prevLen == 0) 0 else (code + 1) << (lens(i) - prevLen)
        out(i) = code
        prevLen = lens(i)
      }
      out
    }
    lazy val decode: Map[(Int, Int), Int] =
      symbols.indices.map(i => (lens(i), codes(i)) -> symbols(i)).toMap
  }

  private final class BitWriter {
    private val bos = new ByteArrayOutputStream()
    private var cur = 0
    private var nIn = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nIn += 1
        if (nIn == 8) { bos.write(cur); cur = 0; nIn = 0 }
        i -= 1
      }
    }
    def result(): Array[Byte] = {
      if (nIn > 0) { bos.write(cur << (8 - nIn)); cur = 0; nIn = 0 }
      bos.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    def readBit(): Int = {
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  // ------------------------- compression header ----------------------------

  private case class TagDef(t1: Char, t2: Char, typ: Char) {
    def contentId: Int = (t1.toInt << 16) | (t2.toInt << 8) | typ.toInt
    def key: String = s"$t1$t2"
  }

  private case class CompressionHeader(
      seriesEnc: Map[String, SeriesEnc],
      tagLines: IndexedSeq[Seq[TagDef]])

  /** Default encoding per series: EXTERNAL, RN via BYTE_ARRAY_STOP. */
  private def defaultEncodings: Map[String, SeriesEnc] =
    SeriesIds.map { case (key, id) =>
      key -> (if (key == "RN") StopEnc('\t', id) else ExtEnc(id))
    }

  private def writeEncodingSpec(em: ByteArrayOutputStream, e: SeriesEnc): Unit = {
    val params = new ByteArrayOutputStream()
    val codec = e match {
      case ExtEnc(id) => writeItf8(params, id); EncExternal
      case StopEnc(stop, id) =>
        params.write(stop); writeItf8(params, id); EncByteArrayStop
      case ConstEnc(v) =>
        writeItf8(params, 1); writeItf8(params, v)
        writeItf8(params, 1); writeItf8(params, 0)
        EncHuffman
      case h: HuffEnc =>
        writeItf8(params, h.symbols.length)
        h.symbols.foreach(writeItf8(params, _))
        writeItf8(params, h.lens.length)
        h.lens.foreach(writeItf8(params, _))
        EncHuffman
      case BetaEnc(offset, nbits) =>
        writeItf8(params, offset); writeItf8(params, nbits); EncBeta
    }
    writeItf8(em, codec)
    val p = params.toByteArray
    writeItf8(em, p.length); em.write(p, 0, p.length)
  }

  private def writeCompressionHeader(
      tagLines: IndexedSeq[Seq[TagDef]],
      encodings: Map[String, SeriesEnc]): Block = {
    val out = new ByteArrayOutputStream()
    // preservation map: RN=true, AP(delta)=false, RR=false, TD=dictionary
    val pm = new ByteArrayOutputStream()
    writeItf8(pm, 4)
    def kv(k: String, v: Int): Unit = { pm.write(k(0)); pm.write(k(1)); pm.write(v) }
    kv("RN", 1); kv("AP", 0); kv("RR", 0)
    pm.write('T'); pm.write('D')
    val td = new ByteArrayOutputStream()
    tagLines.foreach { line =>
      line.foreach { t => td.write(t.t1); td.write(t.t2); td.write(t.typ) }
      td.write(0)
    }
    val tdBytes = td.toByteArray
    writeItf8(pm, tdBytes.length)
    pm.write(tdBytes, 0, tdBytes.length)
    val pmBytes = pm.toByteArray
    writeItf8(out, pmBytes.length)
    out.write(pmBytes, 0, pmBytes.length)

    // data series encoding map
    val em = new ByteArrayOutputStream()
    writeItf8(em, encodings.size)
    encodings.toSeq.sortBy(_._1).foreach { case (key, e) =>
      em.write(key(0)); em.write(key(1))
      writeEncodingSpec(em, e)
    }
    val emBytes = em.toByteArray
    writeItf8(out, emBytes.length)
    out.write(emBytes, 0, emBytes.length)

    // tag encoding map: per tag, BYTE_ARRAY_STOP? values are
    // concatenated BAM-typed bytes in the tag's own external block —
    // declare EXTERNAL (we parse by type)
    val tm = new ByteArrayOutputStream()
    val tags = tagLines.flatten.distinct
    writeItf8(tm, tags.length)
    tags.foreach { t =>
      writeItf8(tm, t.contentId)
      writeItf8(tm, EncExternal)
      val params = new ByteArrayOutputStream()
      writeItf8(params, t.contentId)
      val p = params.toByteArray
      writeItf8(tm, p.length); tm.write(p, 0, p.length)
    }
    val tmBytes = tm.toByteArray
    writeItf8(out, tmBytes.length)
    out.write(tmBytes, 0, tmBytes.length)

    Block(1, 0, out.toByteArray)
  }

  private def readCompressionHeader(b: Block): CompressionHeader = {
    val in = new ByteArrayInputStream(b.data)
    // preservation map
    readItf8(in) // size
    val nPm = readItf8(in)
    var tagLines: IndexedSeq[Seq[TagDef]] = IndexedSeq(Seq.empty)
    var i = 0
    while (i < nPm) {
      val key = new String(Array(in.read().toByte, in.read().toByte))
      key match {
        case "TD" =>
          val len = readItf8(in)
          val bytes = new Array[Byte](len)
          in.read(bytes)
          val lines = IndexedSeq.newBuilder[Seq[TagDef]]
          var o = 0
          var cur = Seq.newBuilder[TagDef]
          while (o < len) {
            if (bytes(o) == 0) { lines += cur.result(); cur = Seq.newBuilder; o += 1 }
            else {
              cur += TagDef(bytes(o).toChar, bytes(o + 1).toChar, bytes(o + 2).toChar)
              o += 3
            }
          }
          val ls = lines.result()
          if (ls.nonEmpty) tagLines = ls
        case "SM" => skipFully(in, 5)
        case _ => in.read() // boolean prescription byte
      }
      i += 1
    }
    // data series encodings
    readItf8(in)
    val nEm = readItf8(in)
    val enc = Map.newBuilder[String, SeriesEnc]
    i = 0
    while (i < nEm) {
      val key = new String(Array(in.read().toByte, in.read().toByte))
      val codec = readItf8(in)
      val plen = readItf8(in)
      val params = new Array[Byte](plen)
      in.read(params)
      val pin = new ByteArrayInputStream(params)
      codec match {
        case EncExternal => enc += key -> ExtEnc(readItf8(pin))
        case EncByteArrayStop =>
          val stop = pin.read().toByte
          enc += key -> StopEnc(stop, readItf8(pin))
        case EncHuffman =>
          val nSyms = readItf8(pin)
          val symbols = Array.fill(nSyms)(readItf8(pin))
          val nLens = readItf8(pin)
          val lens = Array.fill(nLens)(readItf8(pin))
          enc += key -> (
            if (nSyms == 1) ConstEnc(symbols(0))
            else HuffEnc(symbols, lens))
        case EncBeta =>
          val offset = readItf8(pin)
          val nbits = readItf8(pin)
          enc += key -> BetaEnc(offset, nbits)
        case 0 => // NULL encoding: series absent
        case other =>
          throw new UnsupportedOperationException(
            s"CRAM encoding codec $other for series $key not supported " +
              "(supported: EXTERNAL, BYTE_ARRAY_STOP, HUFFMAN, BETA)")
      }
      i += 1
    }
    // tag encodings: ids are derivable from the tag defs; skip the map
    CompressionHeader(enc.result(), tagLines)
  }

  // ------------------------------ writing ----------------------------------

  private class SeriesWriter(enc: Map[String, SeriesEnc]) {
    val streams = scala.collection.mutable.Map.empty[Int, ByteArrayOutputStream]
    val core = new BitWriter
    def s(id: Int): ByteArrayOutputStream =
      streams.getOrElseUpdate(id, new ByteArrayOutputStream())
    def itf8(series: String, v: Int): Unit = enc(series) match {
      case ExtEnc(id) => writeItf8(s(id), v)
      case StopEnc(_, id) => writeItf8(s(id), v)
      case ConstEnc(c) =>
        require(v == c, s"series $series declared constant $c, got $v")
      case BetaEnc(offset, nbits) => core.write(v + offset, nbits)
      case h: HuffEnc =>
        val i = h.symbols.indexOf(v)
        require(i >= 0, s"series $series: symbol $v not in huffman alphabet")
        core.write(h.codes(i), h.lens(i))
    }
    // feature codes are ASCII < 0x80, so the raw byte equals its itf8 form
    def byte(series: String, v: Int): Unit = itf8(series, v)
    def bytes(series: String, b: Array[Byte]): Unit = enc(series) match {
      case ExtEnc(id) => s(id).write(b, 0, b.length)
      case StopEnc(_, id) => s(id).write(b, 0, b.length)
      case other => throw new IllegalStateException(
        s"series $series carries byte payloads; encoding $other invalid")
    }
  }

  private case class Feat(code: Char, pos: Int, lenOrBytes: Either[Int, Array[Byte]])

  /** cigar + stored bases -> CRAM read features (1-based in-read pos). */
  private def buildFeatures(r: Alignment, seq: String): Seq[Feat] = {
    val feats = Seq.newBuilder[Feat]
    var readPos = 1
    Cigar.parse(r.cigar.getOrElse(s"${seq.length}M")).foreach { e =>
      e.op match {
        case 'M' | '=' | 'X' | 'S' | 'I' =>
          val code = e.op match {
            case 'M' | '=' | 'X' => 'b'
            case other => other
          }
          feats += Feat(code, readPos,
            Right(seq.substring(readPos - 1,
              math.min(seq.length, readPos - 1 + e.length)).getBytes("UTF-8")))
          readPos += e.length
        case 'D' => feats += Feat('D', readPos, Left(e.length.toInt))
        case 'N' => feats += Feat('N', readPos, Left(e.length.toInt))
        case 'H' => feats += Feat('H', readPos, Left(e.length.toInt))
        case 'P' => feats += Feat('P', readPos, Left(e.length.toInt))
        case _ =>
      }
    }
    feats.result()
  }

  private def bitsFor(maxV: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, maxV)))

  /** Equal-length canonical huffman over the given alphabet (single symbol
    * degenerates to a zero-bit constant). */
  private def huffFor(symbols: Seq[Int]): SeriesEnc =
    if (symbols.size == 1) ConstEnc(symbols.head)
    else {
      val sorted = symbols.sorted.toArray
      val len = bitsFor(symbols.size - 1)
      HuffEnc(sorted, Array.fill(sorted.length)(len))
    }

  private def bamFlags(r: Alignment): Int = SamIO.flagOf(r)

  private def parseTag(k: String, v: String): Option[(TagDef, String)] =
    if (k.length == 2 && v.length > 2 && v(1) == ':' && "AifZ".contains(v(0)))
      Some((TagDef(k(0), k(1), v(0)), v.drop(2)))
    else None

  private def tagValueBytes(t: TagDef, v: String): Array[Byte] = t.typ match {
    case 'A' => Array(v.head.toByte)
    case 'i' =>
      val x = v.toInt
      Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
        ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    case 'f' =>
      val x = java.lang.Float.floatToIntBits(v.toFloat)
      Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
        ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    case _ => v.getBytes("UTF-8") :+ 0.toByte
  }

  private def encodeContainer(
      records: Seq[Alignment], refIndex: Map[String, Int],
      rgIndex: Map[String, Int], counterStart: Long,
      coreProfile: Boolean = false): Array[Byte] = {

    // tag dictionary for this container
    val recTags: Seq[Seq[(TagDef, String)]] = records.map { r =>
      r.attributes.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => parseTag(k, v) }
    }
    val tagLines: IndexedSeq[Seq[TagDef]] =
      recTags.map(_.map(_._1)).distinct.toIndexedSeq
    val lineIdx: Map[Seq[TagDef], Int] = tagLines.zipWithIndex.toMap

    // feature pre-pass: needed for the record loop and (core profile) for
    // encoding parameter selection
    val recFeats: Seq[Option[Seq[Feat]]] = records.map { r =>
      if (r.readMapped.getOrElse(false))
        Some(buildFeatures(r, r.sequence.getOrElse("")))
      else None
    }

    val encodings: Map[String, SeriesEnc] =
      if (!coreProfile) defaultEncodings
      else {
        val allFeats = recFeats.flatten.flatten
        val maxRL = records.map(_.sequence.map(_.length).getOrElse(0)).maxOption.getOrElse(1)
        val maxFN = recFeats.flatten.map(_.length).maxOption.getOrElse(1)
        val maxFP = allFeats.map(_.pos).maxOption.getOrElse(1)
        val fcAlphabet = allFeats.map(_.code.toInt).distinct
        defaultEncodings ++ Map(
          "RL" -> BetaEnc(0, bitsFor(maxRL)),
          "MQ" -> BetaEnc(0, 8),
          "FN" -> BetaEnc(0, bitsFor(maxFN)),
          "FP" -> BetaEnc(0, bitsFor(maxFP)),
          "TL" -> huffFor(tagLines.indices)) ++
          (if (fcAlphabet.nonEmpty) Map("FC" -> huffFor(fcAlphabet)) else Map.empty)
      }

    val w = new SeriesWriter(encodings)
    val tagStreams = scala.collection.mutable.Map.empty[Int, ByteArrayOutputStream]

    records.zip(recTags).zip(recFeats).foreach { case ((r, tags), featsOpt) =>
      val mapped = r.readMapped.getOrElse(false)
      w.itf8("BF", bamFlags(r))
      w.itf8("CF", 3) // qualities preserved | detached
      w.itf8("RI", r.referenceName.flatMap(refIndex.get).getOrElse(-1))
      val seq = r.sequence.getOrElse("")
      w.itf8("RL", seq.length)
      w.itf8("AP", r.start.map(_ + 1).getOrElse(0L).toInt)
      w.itf8("RG", r.readGroupId.flatMap(rgIndex.get).getOrElse(-1))
      w.bytes("RN", (r.readName.getOrElse("") + "\t").getBytes("UTF-8"))
      // detached mate info
      var mf = 0
      if (r.mateNegativeStrand.getOrElse(false)) mf |= 1
      if (!r.mateMapped.getOrElse(false)) mf |= 2
      w.itf8("MF", mf)
      w.itf8("NS", r.mateReferenceName.flatMap(refIndex.get).getOrElse(-1))
      w.itf8("NP", r.mateAlignmentStart.map(_ + 1).getOrElse(0L).toInt)
      w.itf8("TS", r.insertSize.getOrElse(0L).toInt)
      w.itf8("TL", lineIdx(tags.map(_._1)))
      tags.foreach { case (t, v) =>
        val st = tagStreams.getOrElseUpdate(t.contentId, new ByteArrayOutputStream())
        val vb = tagValueBytes(t, v)
        st.write(vb, 0, vb.length)
      }

      featsOpt match {
        case Some(fs) =>
          w.itf8("FN", fs.length)
          var last = 0
          fs.foreach { f =>
            w.byte("FC", f.code)
            w.itf8("FP", f.pos - last)
            last = f.pos
            (f.code, f.lenOrBytes) match {
              case ('b', Right(bs)) => w.itf8("BB", bs.length); w.bytes("BB", bs)
              case ('S', Right(bs)) => w.itf8("SC", bs.length); w.bytes("SC", bs)
              case ('I', Right(bs)) => w.itf8("IN", bs.length); w.bytes("IN", bs)
              case ('D', Left(l)) => w.itf8("DL", l)
              case ('N', Left(l)) => w.itf8("RS", l)
              case ('H', Left(l)) => w.itf8("HC", l)
              case ('P', Left(l)) => w.itf8("PD", l)
              case _ =>
            }
          }
          w.itf8("MQ", r.mappingQuality.getOrElse(255))
        case None =>
          w.bytes("BA", seq.getBytes("UTF-8"))
      }
      val quals = r.qualityScores.getOrElse("")
      val qb = new Array[Byte](seq.length)
      var qi = 0
      while (qi < seq.length) {
        qb(qi) = if (qi < quals.length) (quals(qi) - 33).toByte else 0xff.toByte
        qi += 1
      }
      w.bytes("QS", qb)
    }

    // blocks: compression header, slice header, core, externals
    val coreData = w.core.result()
    val extBlocks =
      (w.streams.toSeq.map { case (id, s) => Block(4, id, s.toByteArray) } ++
        tagStreams.toSeq.map { case (id, s) => Block(4, id, s.toByteArray) })
        .sortBy(_.contentId)

    val sliceHdr = {
      val out = new ByteArrayOutputStream()
      writeItf8(out, -2) // multi-ref slice
      writeItf8(out, 0); writeItf8(out, 0)
      writeItf8(out, records.length)
      writeLtf8(out, counterStart)
      writeItf8(out, extBlocks.length + 1) // + core block
      writeItf8(out, extBlocks.length)
      extBlocks.foreach(b => writeItf8(out, b.contentId))
      writeItf8(out, -1) // no embedded reference
      out.write(new Array[Byte](16)) // MD5 zero (no reference)
      Block(2, 0, out.toByteArray)
    }

    val payload = new ByteArrayOutputStream()
    writeBlock(payload, writeCompressionHeader(tagLines, encodings))
    val landmark = payload.size()
    writeBlock(payload, sliceHdr)
    writeBlock(payload, Block(5, 0, coreData), MethodRaw) // core bit stream
    extBlocks.foreach { b =>
      // qualities compress best with order-1 rANS; the rest gzip
      val method = if (b.contentId == SeriesIds("QS")) MethodRans else MethodGzip
      writeBlock(payload, b, method)
    }
    val body = payload.toByteArray

    val hdr = new ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      hdr.write(v & 0xff); hdr.write((v >> 8) & 0xff)
      hdr.write((v >> 16) & 0xff); hdr.write((v >> 24) & 0xff)
    }
    w32(body.length)
    writeItf8(hdr, -2)
    writeItf8(hdr, 0); writeItf8(hdr, 0)
    writeItf8(hdr, records.length)
    writeLtf8(hdr, counterStart)
    writeLtf8(hdr, records.map(_.sequence.map(_.length.toLong).getOrElse(0L)).sum)
    writeItf8(hdr, extBlocks.length + 3)
    writeItf8(hdr, 1) // one landmark = slice offset
    writeItf8(hdr, landmark)
    val hb = hdr.toByteArray
    val crc = new CRC32
    crc.update(hb)
    val out = new ByteArrayOutputStream()
    out.write(hb, 0, hb.length)
    val c = crc.getValue
    out.write((c & 0xff).toInt); out.write(((c >> 8) & 0xff).toInt)
    out.write(((c >> 16) & 0xff).toInt); out.write(((c >> 24) & 0xff).toInt)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Write with a `.crai` index sidecar (gzipped text, spec columns:
    * seqId, start, span, container offset, slice offset, slice size) —
    * enables region-pruned reads via [[readIndexed]]. */
  def writeIndexed(gd: GenomicDataset[Alignment], path: String,
      recordsPerContainer: Int = 10000): Unit =
    write(gd, path, recordsPerContainer, writeIndex = true)

  /** `coreProfile=true` declares BETA/HUFFMAN core-bit-stream encodings
    * for RL/MQ/FN/FP/FC/TL instead of EXTERNAL — exercises the core
    * codec path end-to-end (and shrinks those series). */
  def write(gd: GenomicDataset[Alignment], path: String,
      recordsPerContainer: Int = 10000, writeIndex: Boolean = false,
      coreProfile: Boolean = false): Unit = {
    val meta = gd.meta
    val refIndex = meta.sequences.records.zipWithIndex
      .map { case (r, i) => r.name -> i }.toMap
    val rgIndex = meta.readGroups.readGroups.zipWithIndex
      .map { case (rg, i) => rg.id -> i }.toMap
    val headerText = SamIO.headerLines(meta).mkString("", "\n", "\n")

    val p = new Path(path)
    val fs = p.getFileSystem(gd.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write(Magic)
      val fileId = new Array[Byte](20)
      val pb = path.getBytes("UTF-8")
      System.arraycopy(pb, 0, fileId, 0, math.min(20, pb.length))
      out.write(fileId)

      // header container: one raw block holding i32 length + SAM text
      {
        val hdrBytes = {
          val b = new ByteArrayOutputStream()
          val t = headerText.getBytes("UTF-8")
          b.write(t.length & 0xff); b.write((t.length >> 8) & 0xff)
          b.write((t.length >> 16) & 0xff); b.write((t.length >> 24) & 0xff)
          b.write(t, 0, t.length)
          b.toByteArray
        }
        val payload = new ByteArrayOutputStream()
        writeBlock(payload, Block(0, 0, hdrBytes), MethodRaw)
        val body = payload.toByteArray
        val hdr = new ByteArrayOutputStream()
        hdr.write(body.length & 0xff); hdr.write((body.length >> 8) & 0xff)
        hdr.write((body.length >> 16) & 0xff); hdr.write((body.length >> 24) & 0xff)
        writeItf8(hdr, 0); writeItf8(hdr, 0); writeItf8(hdr, 0)
        writeItf8(hdr, 0)
        writeLtf8(hdr, 0L); writeLtf8(hdr, 0L)
        writeItf8(hdr, 1)
        writeItf8(hdr, 0)
        val hb = hdr.toByteArray
        val crc = new CRC32; crc.update(hb)
        out.write(hb)
        val c = crc.getValue
        out.write((c & 0xff).toInt); out.write(((c >> 8) & 0xff).toInt)
        out.write(((c >> 16) & 0xff).toInt); out.write(((c >> 24) & 0xff).toInt)
        out.write(body)
      }

      var counter = 0L
      val craiLines = Seq.newBuilder[String]
      val it = gd.ds.toLocalIterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Alignment]
      def flush(): Unit = if (buf.nonEmpty) {
        val containerOffset = out.getPos
        val body = encodeContainer(buf.toSeq, refIndex, rgIndex, counter,
          coreProfile)
        out.write(body)
        if (writeIndex) {
          // one index line per referenced contig span in this container
          buf.toSeq.groupBy(_.referenceName.flatMap(refIndex.get))
            .foreach {
              case (Some(ri), rs) =>
                val starts = rs.flatMap(_.start)
                if (starts.nonEmpty) {
                  val mn = starts.min
                  val mx = rs.flatMap(_.end).maxOption.getOrElse(mn + 1)
                  craiLines += Seq(ri, mn + 1, mx - mn,
                    containerOffset, 0, body.length).mkString("\t")
                }
              case _ =>
            }
        }
        counter += buf.length
        buf.clear()
      }
      while (it.hasNext) {
        buf += it.next()
        if (buf.length >= recordsPerContainer) flush()
      }
      flush()
      if (writeIndex) {
        val craiOut = new GZIPOutputStream(
          fs.create(new Path(path + ".crai"), true))
        try craiOut.write(
          craiLines.result().mkString("", "\n", "\n").getBytes("UTF-8"))
        finally craiOut.close()
      }
      // EOF sentinel: the spec's literal CRAM 3.0 EOF container bytes
      // (htsjdk/samtools validate this exact sequence)
      out.write(EofContainer)
    } finally out.close()
  }

  // ------------------------------ reading ----------------------------------

  private case class ContainerHeader(
      length: Int, refSeqId: Int, nRecords: Int, nBlocks: Int)

  private def readContainerHeader(in: InputStream): Option[ContainerHeader] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val len = b0 | (in.read() << 8) | (in.read() << 16) | (in.read() << 24)
    val refSeqId = readItf8(in)
    readItf8(in); readItf8(in)
    val nRecords = readItf8(in)
    readLtf8(in); readLtf8(in)
    val nBlocks = readItf8(in)
    val nLandmarks = readItf8(in)
    var i = 0
    while (i < nLandmarks) { readItf8(in); i += 1 }
    skipFully(in, 4) // CRC
    Some(ContainerHeader(len, refSeqId, nRecords, nBlocks))
  }

  /** itf8 decoded straight off the array; returns the new offset in the
    * high int and the value in the low int via a packed long (avoids a
    * stream allocation per field per record). */
  private def itf8At(b: Array[Byte], o: Int): Long = {
    val b0 = b(o) & 0xff
    if ((b0 & 0x80) == 0) ((o + 1).toLong << 32) | (b0.toLong & 0xffffffffL)
    else if ((b0 & 0x40) == 0)
      ((o + 2).toLong << 32) | ((((b0 & 0x3f) << 8) | (b(o + 1) & 0xff)).toLong & 0xffffffffL)
    else if ((b0 & 0x20) == 0)
      ((o + 3).toLong << 32) | ((((b0 & 0x1f) << 16) | ((b(o + 1) & 0xff) << 8) |
        (b(o + 2) & 0xff)).toLong & 0xffffffffL)
    else if ((b0 & 0x10) == 0)
      ((o + 4).toLong << 32) | ((((b0 & 0x0f) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)).toLong & 0xffffffffL)
    else
      ((o + 5).toLong << 32) | ((((b0 & 0x0f) << 28) | ((b(o + 1) & 0xff) << 20) |
        ((b(o + 2) & 0xff) << 12) | ((b(o + 3) & 0xff) << 4) |
        (b(o + 4) & 0x0f)).toLong & 0xffffffffL)
  }

  private class SeriesReader(
      blocks: Map[Int, Array[Byte]], ch: CompressionHeader,
      core: Array[Byte]) {
    private val pos = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    private val bits = new BitReader(core)
    private def stream(series: String): Int = ch.seriesEnc.get(series) match {
      case Some(ExtEnc(id)) => id
      case Some(StopEnc(_, id)) => id
      case other =>
        throw new UnsupportedOperationException(
          s"series $series is not byte-stream encoded ($other)")
    }
    def itf8(series: String): Int = ch.seriesEnc.get(series) match {
      case Some(ConstEnc(c)) => c
      case Some(BetaEnc(offset, nbits)) => bits.readBits(nbits) - offset
      case Some(h: HuffEnc) =>
        var acc = 0
        var len = 0
        while (len < 32) {
          acc = (acc << 1) | bits.readBit()
          len += 1
          h.decode.get((len, acc)) match {
            case Some(sym) => return sym
            case None =>
          }
        }
        throw new IllegalStateException(s"series $series: bad huffman code")
      case _ =>
        val id = stream(series)
        val packed = itf8At(blocks(id), pos(id))
        pos(id) = (packed >>> 32).toInt
        packed.toInt
    }
    def bytes(series: String, n: Int): Array[Byte] = {
      val id = stream(series)
      val b = blocks(id)
      val out = java.util.Arrays.copyOfRange(b, pos(id), pos(id) + n)
      pos(id) += n
      out
    }
    // feature codes are ASCII < 0x80: raw byte == its itf8 form, and core
    // encodings route through the same dispatch
    def byte(series: String): Int = itf8(series)
    def untilStop(series: String, stop: Byte): String = {
      val id = stream(series)
      val b = blocks(id)
      var e = pos(id)
      while (e < b.length && b(e) != stop) e += 1
      val s = new String(b, pos(id), e - pos(id), "UTF-8")
      pos(id) = e + 1
      s
    }
    def tagBytes(id: Int, n: Int): Array[Byte] = {
      val b = blocks(id)
      val out = java.util.Arrays.copyOfRange(b, pos(id), pos(id) + n)
      pos(id) += n
      out
    }
    def tagUntilNul(id: Int): String = {
      val b = blocks(id)
      var e = pos(id)
      while (e < b.length && b(e) != 0) e += 1
      val s = new String(b, pos(id), e - pos(id), "UTF-8")
      pos(id) = e + 1
      s
    }
  }

  private[sources] def decodeContainer(
      data: Array[Byte], refNames: Array[String],
      rgIds: Array[String]): Seq[Alignment] = {
    val in = new ByteArrayInputStream(data)
    val chBlock = readBlock(in)
    require(chBlock.contentType == 1, "expected compression header block")
    val ch = readCompressionHeader(chBlock)

    // slice header
    val sh = readBlock(in)
    require(sh.contentType == 2, s"expected slice header, got ${sh.contentType}")
    val shIn = new ByteArrayInputStream(sh.data)
    readItf8(shIn); readItf8(shIn); readItf8(shIn)
    val nRecords = readItf8(shIn)
    readLtf8(shIn)
    val nBlocks = readItf8(shIn)

    val blocks = Map.newBuilder[Int, Array[Byte]]
    var core: Array[Byte] = Array.emptyByteArray
    var i = 0
    while (i < nBlocks) {
      val b = readBlock(in)
      if (b.contentType == 4) blocks += b.contentId -> b.data
      else if (b.contentType == 5) core = b.data
      i += 1
    }
    val r = new SeriesReader(blocks.result(), ch, core)

    (0 until nRecords).map { _ =>
      val bf = r.itf8("BF")
      r.itf8("CF")
      val ri = r.itf8("RI")
      val rl = r.itf8("RL")
      val ap = r.itf8("AP")
      val rg = r.itf8("RG")
      val name = r.untilStop("RN", '\t')
      val mf = r.itf8("MF")
      val ns = r.itf8("NS")
      val np = r.itf8("NP")
      val ts = r.itf8("TS")
      val tl = r.itf8("TL")
      val attrs = Map.newBuilder[String, String]
      ch.tagLines(tl).foreach { t =>
        val v = t.typ match {
          case 'A' => r.tagBytes(t.contentId, 1)(0).toChar.toString
          case 'i' =>
            val b = r.tagBytes(t.contentId, 4)
            ((b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) |
              ((b(3) & 0xff) << 24)).toString
          case 'f' =>
            val b = r.tagBytes(t.contentId, 4)
            java.lang.Float.intBitsToFloat(
              (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) |
                ((b(3) & 0xff) << 24)).toString
          case _ => r.tagUntilNul(t.contentId)
        }
        attrs += t.key -> s"${t.typ}:$v"
      }
      val mapped = (bf & 0x4) == 0

      var seq = ""
      var cigar: Option[String] = None
      var mapq: Option[Int] = None
      var refLen = 0L
      if (mapped) {
        val fn = r.itf8("FN")
        val sb = new StringBuilder(rl)
        val cig = new StringBuilder
        var lastOp = ' '
        var lastLen = 0L
        def emit(op: Char, len: Long): Unit =
          if (len > 0) {
            if (op == lastOp) lastLen += len
            else {
              if (lastOp != ' ') cig.append(lastLen).append(lastOp)
              lastOp = op; lastLen = len
            }
          }
        var k = 0
        while (k < fn) {
          val fc = r.byte("FC").toChar
          r.itf8("FP")
          fc match {
            case 'b' =>
              val n = r.itf8("BB"); val bs = r.bytes("BB", n)
              sb.append(new String(bs, "UTF-8")); emit('M', n); refLen += n
            case 'S' =>
              val n = r.itf8("SC"); val bs = r.bytes("SC", n)
              sb.append(new String(bs, "UTF-8")); emit('S', n)
            case 'I' =>
              val n = r.itf8("IN"); val bs = r.bytes("IN", n)
              sb.append(new String(bs, "UTF-8")); emit('I', n)
            case 'D' => val n = r.itf8("DL"); emit('D', n); refLen += n
            case 'N' => val n = r.itf8("RS"); emit('N', n); refLen += n
            case 'H' => val n = r.itf8("HC"); emit('H', n)
            case 'P' => val n = r.itf8("PD"); emit('P', n)
            case other =>
              throw new UnsupportedOperationException(
                s"CRAM read feature '$other' not supported")
          }
          k += 1
        }
        if (lastOp != ' ') cig.append(lastLen).append(lastOp)
        mapq = Some(r.itf8("MQ")).filter(_ != 255)
        cigar = Some(cig.toString).filter(_.nonEmpty)
        seq = sb.toString
      } else {
        seq = new String(r.bytes("BA", rl), "UTF-8")
      }
      val qb = r.bytes("QS", rl)
      val quals =
        if (rl == 0 || (qb.nonEmpty && (qb(0) & 0xff) == 0xff)) None
        else Some(qb.map(q => ((q & 0xff) + 33).toChar).mkString)

      def bit(m: Int): Boolean = (bf & m) != 0
      val attributes = attrs.result()
      Alignment(
        readName = Some(name).filter(_.nonEmpty),
        referenceName = if (ri >= 0 && ri < refNames.length) Some(refNames(ri)) else None,
        start = if (mapped && ap > 0) Some(ap - 1L) else None,
        end = if (mapped && ap > 0) Some(ap - 1L + refLen) else None,
        mappingQuality = mapq,
        cigar = cigar,
        sequence = Some(seq).filter(_.nonEmpty),
        qualityScores = quals,
        mateReferenceName =
          if (ns >= 0 && ns < refNames.length) Some(refNames(ns)) else None,
        mateAlignmentStart = if (np > 0 && bit(0x1)) Some(np - 1L) else None,
        insertSize = Some(ts.toLong).filter(_ != 0L),
        readPaired = Some(bit(0x1)), properPair = Some(bit(0x2)),
        readMapped = Some(mapped), mateMapped = Some(!bit(0x8)),
        readNegativeStrand = Some(bit(0x10)), mateNegativeStrand = Some(bit(0x20)),
        readInFragment = Some(if (bit(0x80)) 1 else 0),
        secondaryAlignment = Some(bit(0x100)),
        failedVendorQualityChecks = Some(bit(0x200)),
        duplicateRead = Some(bit(0x400)),
        supplementaryAlignment = Some(bit(0x800)),
        primaryAlignment = Some(!bit(0x100) && !bit(0x800)),
        readGroupId = if (rg >= 0 && rg < rgIds.length) Some(rgIds(rg))
          else attributes.get("RG").map(_.drop(2)),
        mismatchingPositions = attributes.get("MD").map(_.drop(2)),
        attributes = attributes)
    }
  }

  /** Region-pruned read of a `.crai`-indexed CRAM: only containers whose
    * index spans overlap the query regions are decoded; decoded records
    * are filtered against the query set. */
  def readIndexed(
      spark: SparkSession, path: String,
      regions: Seq[ReferenceRegion]): GenomicDataset[Alignment] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val whole = read(spark, path) // metadata + container scan (headers only)
    val refIdx = whole.meta.sequences.records.map(_.name)
      .zipWithIndex.toMap
    val wanted: Set[Long] = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new GZIPInputStream(fs.open(new Path(path + ".crai"))), "UTF-8"))
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty)
        .flatMap { l =>
          val f = l.split("\t")
          val (ri, start1, span, off) =
            (f(0).toInt, f(1).toLong, f(2).toLong, f(3).toLong)
          val hit = regions.exists(rr =>
            refIdx.get(rr.referenceName).contains(ri) &&
              (start1 - 1) < rr.end && rr.start < (start1 - 1 + span))
          if (hit) Some(off) else None
        }.toSet
      finally in.close()
    }
    val regionsB = spark.sparkContext.broadcast(regions)
    val pruned = prunedRead(spark, path, wanted)
    pruned.transform(_.filter { r =>
      (r.referenceName, r.start, r.end) match {
        case (Some(rn), Some(s), Some(e)) =>
          regionsB.value.exists(rr =>
            rr.referenceName == rn && s < rr.end && rr.start < e)
        case _ => false
      }
    })
  }

  private def prunedRead(spark: SparkSession, path: String,
      keepOffsets: Set[Long]): GenomicDataset[Alignment] =
    readInternal(spark, path, Some(keepOffsets))

  def read(spark: SparkSession, path: String): GenomicDataset[Alignment] =
    readInternal(spark, path, None)

  private def readInternal(spark: SparkSession, path: String,
      keepOffsets: Option[Set[Long]]): GenomicDataset[Alignment] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // driver pass: file definition, header container, container offsets
    val in = fs.open(p)
    val magic = new Array[Byte](6)
    in.readFully(magic)
    require(magic.sameElements(Magic), "not a CRAM 3.0 file")
    skipFully(in, 20)

    val hdrContainer = readContainerHeader(in).getOrElse(
      throw new EOFException("missing CRAM header container"))
    val hdrBodyStart = in.getPos
    val headerBlock = readBlock(in)
    val hd = headerBlock.data
    val hLen = (hd(0) & 0xff) | ((hd(1) & 0xff) << 8) |
      ((hd(2) & 0xff) << 16) | ((hd(3) & 0xff) << 24)
    val headerText = new String(hd, 4, hLen, "UTF-8")
    val meta = SamIO.parseHeader(
      headerText.split("\n").filter(_.startsWith("@")).toSeq)
    val refNames = meta.sequences.records.map(_.name).toArray
    val rgIds = meta.readGroups.readGroups.map(_.id).toArray

    // scan container offsets (headers only); honor the header container's
    // declared length (other writers may pad it with extra blocks)
    val fileLen = fs.getFileStatus(p).getLen
    val offsets = Seq.newBuilder[(Long, Int)]
    var pos = hdrBodyStart + hdrContainer.length
    var done = false
    while (!done && pos < fileLen) {
      in.seek(pos)
      val headerStart = pos
      readContainerHeader(in) match {
        case Some(hc) if hc.nRecords > 0 =>
          val bodyStart = in.getPos
          if (keepOffsets.forall(_.contains(headerStart)))
            offsets += ((bodyStart, hc.length))
          pos = bodyStart + hc.length
        case Some(hc) =>
          pos = in.getPos + hc.length // header/EOF container: skip
        case None => done = true
      }
    }
    in.close()

    val containers = offsets.result()
    val refNamesB = spark.sparkContext.broadcast(refNames)
    val rgIdsB = spark.sparkContext.broadcast(rgIds)
    val confB = spark.sparkContext.broadcast(HadoopConf(spark))
    val file = path
    val rdd = spark.sparkContext
      .parallelize(containers, math.max(1, containers.length))
      .flatMap { case (off, len) =>
        val fp = new Path(file)
        val tfs = fp.getFileSystem(confB.value.value)
        val tin = tfs.open(fp)
        try {
          tin.seek(off)
          val buf = new Array[Byte](len)
          tin.readFully(buf)
          decodeContainer(buf, refNamesB.value, rgIdsB.value)
        } finally tin.close()
      }
    GenomicDataset(spark.createDataset(rdd), meta)
  }
}
