package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException,
  InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader/writer — the container format web
  * corpora (Common Crawl et al.) actually arrive in, implemented from the
  * public spec: records are `WARC/1.0` + CRLF-terminated `Name: value`
  * headers + empty line + `Content-Length` payload bytes + CRLF CRLF.
  *
  * Scale design: crawl archives ship as MANY ~1 GB files, so file-level
  * parallelism is the native partitioning — `read` maps one task per file
  * via `binaryFiles` and parses each as a STREAM (constant memory: records
  * are decoded one at a time off the (possibly gzip) input, never the whole
  * file). Per-record-gzip members (the Common Crawl convention) need no
  * boundary scan: `GZIPInputStream` consumes concatenated members
  * transparently and the record grammar itself delimits records.
  *
  * Sinks: `write` streams records to a single file (fixture/export shape,
  * like the other single-file sinks); large outputs should go to parquet.
  */
object WarcIO {

  final case class WarcRecord(
      recordType: String,
      targetUri: Option[String],
      date: Option[String],
      contentType: Option[String],
      recordId: Option[String],
      content: Array[Byte])

  // ------------------------------- writing --------------------------------

  private def writeRecord(out: OutputStream, r: WarcRecord): Unit = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: ${r.recordType}\r\n")
    r.targetUri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    r.date.foreach(d => sb.append(s"WARC-Date: $d\r\n"))
    r.recordId.foreach(i => sb.append(s"WARC-Record-ID: $i\r\n"))
    r.contentType.foreach(c => sb.append(s"Content-Type: $c\r\n"))
    sb.append(s"Content-Length: ${r.content.length}\r\n")
    sb.append("\r\n")
    out.write(sb.toString.getBytes(UTF_8))
    out.write(r.content)
    out.write("\r\n\r\n".getBytes(UTF_8))
  }

  /** Write records to a single WARC file; `gzipPerRecord = true` emits one
    * gzip member per record (the Common Crawl layout). */
  def write(path: String, records: Seq[WarcRecord],
      gzipPerRecord: Boolean = false): Unit = {
    val fs = new java.io.FileOutputStream(path)
    try {
      if (gzipPerRecord) {
        records.foreach { r =>
          // one gzip member per record: finish() closes the member while
          // keeping the underlying stream open for the next one
          val gz = new GZIPOutputStream(fs)
          writeRecord(gz, r)
          gz.finish()
        }
      } else {
        records.foreach(writeRecord(fs, _))
      }
    } finally fs.close()
  }

  // ------------------------------- parsing --------------------------------

  /** Read one CRLF-terminated line as UTF-8 (returns null at EOF before
    * any byte). Byte-accurate: never reads past the LF. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      buf.write(b)
      b = in.read()
    }
    val s = buf.toString("UTF-8")
    if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n - off)
      if (r < 0) throw new EOFException(
        s"truncated WARC payload: expected $n bytes, got $off")
      off += r
    }
    out
  }

  /** Streaming record iterator over a (decompressed) WARC stream. Skips
    * blank separator lines between records; fails loudly on a version
    * line that is not `WARC/…` or a record without Content-Length. */
  def parseStream(in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = advance()

      private def advance(): WarcRecord = {
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) return null
        require(line.startsWith("WARC/"),
          s"not a WARC record header: '${line.take(40)}'")
        val headers = scala.collection.mutable.LinkedHashMap[String, String]()
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"malformed WARC header line: '${h.take(60)}'")
          headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
          h = readLine(in)
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            "WARC record missing Content-Length")).toInt
        val body = readFully(in, len)
        WarcRecord(
          headers.getOrElse("warc-type", "unknown"),
          headers.get("warc-target-uri"),
          headers.get("warc-date"),
          headers.get("content-type"),
          headers.get("warc-record-id"),
          body)
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec
        nextRec = advance()
        r
      }
    }

  private def isGzip(b1: Int, b2: Int): Boolean =
    b1 == 0x1f && b2 == 0x8b

  /** Distributed WARC read: one task per file (the crawl-archive native
    * parallelism), records streamed with constant memory, gzip detected
    * per file by magic. Output columns: (record_type, target_uri,
    * warc_date, content_type, record_id, content, src_file). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        raw.mark(2)
        val b1 = raw.read(); val b2 = raw.read()
        raw.reset()
        val in: InputStream =
          if (isGzip(b1, b2)) new GZIPInputStream(raw, 1 << 16) else raw
        parseStream(in).map(r => (
          r.recordType, r.targetUri, r.date, r.contentType, r.recordId,
          r.content, file))
      }
      .toDF("record_type", "target_uri", "warc_date", "content_type",
        "record_id", "content", "src_file")
  }

  /** WET-shape projection: `conversion` records (pre-extracted plain text,
    * the Common Crawl WET sidecar format — same container, different
    * record type) decoded as UTF-8. */
  def conversions(warc: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    warc.filter(col("record_type") === "conversion")
      .select(col("target_uri"), col("warc_date"),
        decode(col("content"), "UTF-8").as("text"), col("src_file"))
  }

  /** The standard crawl-intake projection: HTTP `response` records with
    * their payload decoded as UTF-8 text (the input to
    * [[graft.operators.WebOps.htmlToText]]). HTTP response headers, when
    * present (Content-Type `application/http`), are stripped at the first
    * blank line — the spec's message envelope. */
  def responses(warc: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val htmlOf = udf { (content: Array[Byte], contentType: String) =>
      val s = new String(content, UTF_8)
      if (contentType != null && contentType.startsWith("application/http")) {
        val i = s.indexOf("\r\n\r\n")
        if (i >= 0) s.substring(i + 4) else s
      } else s
    }
    warc.filter(col("record_type") === "response")
      .select(col("target_uri"), col("warc_date"),
        htmlOf(col("content"), col("content_type")).as("html"),
        col("src_file"))
  }
}
