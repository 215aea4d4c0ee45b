package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import graft.core.GenomicDataset
import graft.model._

/** BAM binary IO, from the public SAM/BAM specification §4 (the reference
  * uses hadoop-bam's AnySAMInputFormat + htsjdk, ADAMContext.scala:
  * 2041-2111; neither ships in this stack, so the record codec is
  * implemented from the spec over the [[Bgzf]] container).
  *
  * Parallelism model: one stream per FILE (BAM's BGZF blocks are
  * splittable in principle — hadoop-bam's approach — but block-boundary
  * discovery is heuristic; per-file tasks are exact and scale across the
  * many-file layouts produced by distributed writers). Header parsing is
  * driver-side, record decoding runs in executors.
  */
object BamIO {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
    Encoders.product[Alignment]

  private val SeqChars = "=ACMGRSVTWYHKDBN"
  private val CigarOps = "MIDNSHP=X"
  private val BamMagic: Array[Byte] = Array(66, 65, 77, 1).map(_.toByte)

  // ------------------------------- read -----------------------------------

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException(s"wanted $n bytes, got $off")
      off += r
    }
    b
  }

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Parse the BAM header section; returns (metadata, refNames) and leaves
    * the stream positioned at the first alignment record. */
  def readHeader(in: InputStream): (GenomicMetadata, Array[String]) = {
    val magic = readFully(in, 4)
    require(magic.sameElements(BamMagic),
      "not a BAM stream")
    val lText = i32(readFully(in, 4), 0)
    val text = new String(readFully(in, lText), "UTF-8")
    val nRef = i32(readFully(in, 4), 0)
    val refs = Array.fill(nRef) {
      val lName = i32(readFully(in, 4), 0)
      val name = new String(readFully(in, lName), "UTF-8").takeWhile(_ != 0.toChar)
      val lRef = i32(readFully(in, 4), 0)
      (name, lRef.toLong)
    }
    val meta0 = SamIO.parseHeader(text.split("\n").filter(_.startsWith("@")).toSeq)
    // reconcile: BAM's binary ref list is authoritative if @SQ absent
    val meta =
      if (meta0.sequences.isEmpty)
        meta0.copy(sequences = SequenceDictionary(
          refs.zipWithIndex.map { case ((n, l), i) =>
            SequenceRecord(n, l, index = Some(i)) }.toIndexedSeq))
      else meta0
    (meta, refs.map(_._1))
  }

  /** Decode one alignment record given its byte block. */
  def decodeRecord(b: Array[Byte], refNames: Array[String]): Alignment = {
    val refId = i32(b, 0)
    val pos = i32(b, 4)
    val lReadName = b(8) & 0xff
    val mapq = b(9) & 0xff
    val nCigar = u16(b, 12)
    val flag = u16(b, 14)
    val lSeq = i32(b, 16)
    val nextRefId = i32(b, 20)
    val nextPos = i32(b, 24)
    val tlen = i32(b, 28)
    var o = 32
    val readName = new String(b, o, lReadName - 1, "UTF-8"); o += lReadName
    val cigarSb = new StringBuilder
    var refLen = 0L
    var k = 0
    while (k < nCigar) {
      val v = i32(b, o); o += 4
      val opLen = v >>> 4
      val op = CigarOps.charAt(v & 0xf)
      cigarSb.append(opLen).append(op)
      if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X')
        refLen += opLen
      k += 1
    }
    val seqSb = new StringBuilder(lSeq)
    var i = 0
    while (i < lSeq) {
      val byte = b(o + i / 2) & 0xff
      val nib = if (i % 2 == 0) byte >> 4 else byte & 0xf
      seqSb.append(SeqChars.charAt(nib))
      i += 1
    }
    o += (lSeq + 1) / 2
    val qualRaw = b.slice(o, o + lSeq); o += lSeq
    val quals =
      if (lSeq == 0 || (qualRaw.nonEmpty && (qualRaw(0) & 0xff) == 0xff)) None
      else Some(qualRaw.map(q => ((q & 0xff) + 33).toChar).mkString)

    // tags
    val attrs = Map.newBuilder[String, String]
    while (o < b.length) {
      val tag = new String(b, o, 2, "ISO-8859-1"); o += 2
      val typ = b(o).toChar; o += 1
      def readVal(t: Char): String = t match {
        case 'A' => val v = b(o).toChar.toString; o += 1; v
        case 'c' => val v = b(o).toString; o += 1; v
        case 'C' => val v = (b(o) & 0xff).toString; o += 1; v
        case 's' => val v = u16(b, o).toShort.toString; o += 2; v
        case 'S' => val v = u16(b, o).toString; o += 2; v
        case 'i' | 'I' => val v = i32(b, o).toString; o += 4; v
        case 'f' =>
          val v = java.lang.Float.intBitsToFloat(i32(b, o)).toString; o += 4; v
        case 'Z' | 'H' =>
          val e = { var j = o; while (b(j) != 0) j += 1; j }
          val v = new String(b, o, e - o, "UTF-8"); o = e + 1; v
        case 'B' =>
          val sub = b(o).toChar; o += 1
          val n = i32(b, o); o += 4
          val vals = (0 until n).map(_ => readVal(sub))
          s"$sub,${vals.mkString(",")}"
        case other => throw new IllegalStateException(s"tag type $other")
      }
      val tchar = typ match {
        case 'c' | 'C' | 's' | 'S' | 'I' => 'i'
        case t => t
      }
      attrs += (tag -> s"$tchar:${readVal(typ)}")
    }
    val attributes = attrs.result()

    def bit(m: Int): Boolean = (flag & m) != 0
    val mapped = !bit(0x4) && refId >= 0
    Alignment(
      readName = Some(readName),
      referenceName = if (refId >= 0) Some(refNames(refId)) else None,
      start = if (mapped) Some(pos.toLong) else None,
      end = if (mapped) Some(pos.toLong + refLen) else None,
      mappingQuality = if (mapq == 255) None else Some(mapq),
      cigar = if (nCigar > 0) Some(cigarSb.toString) else None,
      mateReferenceName = if (nextRefId >= 0) Some(refNames(nextRefId)) else None,
      mateAlignmentStart = if (nextPos >= 0 && bit(0x1)) Some(nextPos.toLong) else None,
      insertSize = if (tlen != 0) Some(tlen.toLong) else None,
      sequence = if (lSeq > 0) Some(seqSb.toString) else None,
      qualityScores = quals,
      readPaired = Some(bit(0x1)), properPair = Some(bit(0x2)),
      readMapped = Some(mapped), mateMapped = Some(!bit(0x8)),
      readNegativeStrand = Some(bit(0x10)), mateNegativeStrand = Some(bit(0x20)),
      readInFragment = Some(if (bit(0x80)) 1 else 0),
      secondaryAlignment = Some(bit(0x100)),
      failedVendorQualityChecks = Some(bit(0x200)),
      duplicateRead = Some(bit(0x400)),
      supplementaryAlignment = Some(bit(0x800)),
      primaryAlignment = Some(!bit(0x100) && !bit(0x800)),
      readGroupId = attributes.get("RG").map(_.drop(2)),
      mismatchingPositions = attributes.get("MD").map(_.drop(2)),
      attributes = attributes)
  }

  private def recordIterator(in: InputStream, refNames: Array[String]): Iterator[Alignment] =
    new Iterator[Alignment] {
      private var nextRec: Alignment = advance()
      private def advance(): Alignment = {
        val szb = new Array[Byte](4)
        var off = 0
        while (off < 4) {
          val r = in.read(szb, off, 4 - off)
          if (r < 0) { if (off == 0) return null
            else throw new EOFException("truncated BAM record header") }
          off += r
        }
        val blockSize = i32(szb, 0)
        decodeRecord(readFully(in, blockSize), refNames)
      }
      def hasNext: Boolean = nextRec != null
      def next(): Alignment = { val r = nextRec; nextRec = advance(); r }
    }

  /** Load BAM file(s): header from the first file driver-side; per-file
    * record decoding in executors. `path` may be a file or a directory of
    * part-BAMs. */
  def read(spark: SparkSession, path: String): GenomicDataset[Alignment] = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
          .filterNot(f => f.contains("/_") || f.contains("/."))
          .sorted.toIndexedSeq
      else Seq(path)

    val (meta, _) = {
      val in = Bgzf.inputStream(fs.open(new Path(files.head)))
      try readHeader(in) finally in.close()
    }

    val sc = spark.sparkContext
    val rdd = sc.parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        // default Hadoop conf in-task (site configs come from the
        // classpath; fine for local FS + default HDFS)
        val fp = new Path(f)
        val in = Bgzf.inputStream(fp.getFileSystem(
          new org.apache.hadoop.conf.Configuration()).open(fp))
        val (_, refNames) = readHeader(in)
        recordIterator(in, refNames)
      }
    GenomicDataset(spark.createDataset(rdd), meta)
  }

  // ------------------------------- write ----------------------------------

  private def encodeRecord(r: Alignment, refIndex: Map[String, Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def w32(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }

    val name = r.readName.getOrElse("*")
    val cigar = Cigar.parse(r.cigar.getOrElse(""))
    val seq = r.sequence.getOrElse("")
    val flag = SamIO.flagOf(r)
    w32(r.referenceName.flatMap(refIndex.get).getOrElse(-1))
    w32(r.start.map(_.toInt).getOrElse(-1))
    u8(name.length + 1)
    u8(r.mappingQuality.getOrElse(255))
    w16(0) // bin (unused by our reader)
    w16(cigar.length)
    w16(flag)
    w32(seq.length)
    w32(r.mateReferenceName.flatMap(refIndex.get).getOrElse(-1))
    w32(r.mateAlignmentStart.map(_.toInt).getOrElse(-1))
    w32(r.insertSize.map(_.toInt).getOrElse(0))
    out.write(name.getBytes("UTF-8")); u8(0)
    cigar.foreach(e => w32((e.length << 4) | CigarOps.indexOf(e.op)))
    var i = 0
    while (i < seq.length) {
      val hi = SeqChars.indexOf(Character.toUpperCase(seq.charAt(i))) max 0
      val lo = if (i + 1 < seq.length)
        SeqChars.indexOf(Character.toUpperCase(seq.charAt(i + 1))) max 0 else 0
      u8((hi << 4) | lo)
      i += 2
    }
    r.qualityScores match {
      case Some(q) => q.foreach(c => u8(c - 33))
      case None => (0 until seq.length).foreach(_ => u8(0xff))
    }
    // tags: keep string/int-typed attributes
    r.attributes.toSeq.sortBy(_._1).foreach { case (tag, tv) =>
      if (tag.length == 2 && tv.length > 2 && tv(1) == ':') {
        val typ = tv(0); val v = tv.drop(2)
        typ match {
          case 'i' =>
            out.write(tag.getBytes("ISO-8859-1")); u8('i')
            w32(v.toInt)
          case 'Z' =>
            out.write(tag.getBytes("ISO-8859-1")); u8('Z')
            out.write(v.getBytes("UTF-8")); u8(0)
          case 'A' =>
            out.write(tag.getBytes("ISO-8859-1")); u8('A'); u8(v.head)
          case 'f' =>
            out.write(tag.getBytes("ISO-8859-1")); u8('f')
            w32(java.lang.Float.floatToIntBits(v.toFloat))
          case _ => // drop H/B on write (round-trip subset)
        }
      }
    }
    out.toByteArray
  }

  /** Write a single BAM file (driver-streamed, like FileMerger outputs) or
    * distributed part-BAMs under a directory. */
  def write(gd: GenomicDataset[Alignment], path: String,
      asSingleFile: Boolean = true): Unit = {
    val meta = gd.meta
    val refIndex = meta.sequences.records.zipWithIndex
      .map { case (r, i) => r.name -> i }.toMap
    val headerText = SamIO.headerLines(meta).mkString("", "\n", "\n")

    def writeHeaderTo(out: java.io.OutputStream): Unit = {
      def w32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      out.write(BamMagic)
      val ht = headerText.getBytes("UTF-8")
      w32(ht.length); out.write(ht)
      w32(meta.sequences.records.length)
      meta.sequences.records.foreach { r =>
        val nb = (r.name.getBytes("UTF-8") :+ 0.toByte)
        w32(nb.length); out.write(nb)
        w32(r.length.toInt)
      }
    }

    if (asSingleFile) {
      val conf = gd.spark.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val out = new Bgzf.BgzfOutputStream(fs.create(p, true))
      try {
        writeHeaderTo(out)
        gd.ds.toLocalIterator().forEachRemaining { r =>
          val rec = encodeRecord(r, refIndex)
          val sz = new Array[Byte](4)
          sz(0) = (rec.length & 0xff).toByte
          sz(1) = ((rec.length >> 8) & 0xff).toByte
          sz(2) = ((rec.length >> 16) & 0xff).toByte
          sz(3) = ((rec.length >> 24) & 0xff).toByte
          out.write(sz); out.write(rec)
        }
      } finally out.close()
    } else {
      val spark = gd.spark
      val refIndexB = spark.sparkContext.broadcast(refIndex)
      val headerB = spark.sparkContext.broadcast(
        (headerText, meta.sequences.records.map(r => (r.name, r.length))))
      val dir = new Path(path)
      val fs0 = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs0.mkdirs(dir)
      gd.ds.rdd.mapPartitionsWithIndex { (pid, it) =>
        val part = new Path(dir, f"part-$pid%05d.bam")
        val fs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new Bgzf.BgzfOutputStream(fs.create(part, true))
        try {
          val (ht, refs) = headerB.value
          def w32(v: Int): Unit = {
            out.write(v & 0xff); out.write((v >> 8) & 0xff)
            out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
          }
          out.write(BamMagic)
          val hb = ht.getBytes("UTF-8"); w32(hb.length); out.write(hb)
          w32(refs.length)
          refs.foreach { case (n, l) =>
            val nb = (n.getBytes("UTF-8") :+ 0.toByte)
            w32(nb.length); out.write(nb); w32(l.toInt)
          }
          it.foreach { r =>
            val rec = encodeRecord(r, refIndexB.value)
            w32(rec.length); out.write(rec)
          }
        } finally out.close()
        Iterator.single(1)
      }.count()
    }
  }
}
