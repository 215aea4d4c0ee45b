package graft.sources

import graft.SparkSpec
import graft.sources.WarcIO.WarcRecord
import java.nio.charset.StandardCharsets.UTF_8

class WarcSpec extends SparkSpec {

  private def sampleRecords: Seq[WarcRecord] = Seq(
    WarcRecord("warcinfo", None, Some("2024-01-01T00:00:00Z"), None,
      Some("<urn:uuid:info-1>"), "software: graft\r\n".getBytes(UTF_8)),
    WarcRecord("request", Some("http://example.com/a"), None,
      Some("application/http; msgtype=request"), Some("<urn:uuid:req-1>"),
      "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(UTF_8)),
    WarcRecord("response", Some("http://example.com/a"),
      Some("2024-01-02T03:04:05Z"), Some("application/http; msgtype=response"),
      Some("<urn:uuid:resp-1>"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body><p>Hello WARC</p></body></html>").getBytes(UTF_8)),
    // binary payload with CRLFs and a fake record header inside — the
    // Content-Length framing must carry the parser straight through it
    WarcRecord("resource", Some("http://example.com/bin"), None,
      Some("application/octet-stream"), Some("<urn:uuid:bin-1>"),
      Array[Byte](0x1f.toByte, 0x8b.toByte, '\r', '\n', '\r', '\n') ++
        "WARC/1.0\r\nnot a header".getBytes(UTF_8) ++ Array[Byte](0, 127, -1)),
    WarcRecord("response", Some("http://example.com/empty"), None,
      Some("text/html"), Some("<urn:uuid:resp-2>"), Array.emptyByteArray))

  private def assertRoundTrip(gzip: Boolean): Unit = {
    val path = tmpDir() + (if (gzip) "/t.warc.gz" else "/t.warc")
    WarcIO.write(path, sampleRecords, gzipPerRecord = gzip)
    val got = WarcIO.read(spark, path)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)),
        Option(r.getString(3)), Option(r.getString(4)),
        r.getAs[Array[Byte]](5).toSeq))
    val want = sampleRecords.map(r => (r.recordType, r.targetUri, r.date,
      r.contentType, r.recordId, r.content.toSeq))
    assert(got.toSeq === want)
  }

  test("WARC round trip: plain file, streamed parse, byte-exact payloads") {
    assertRoundTrip(gzip = false)
  }

  test("WARC round trip: gzip-per-record members (Common Crawl layout)") {
    assertRoundTrip(gzip = true)
  }

  test("multi-file read: one task per file, src_file carried") {
    val dir = tmpDir()
    WarcIO.write(s"$dir/a.warc.gz", sampleRecords.take(2), gzipPerRecord = true)
    WarcIO.write(s"$dir/b.warc", sampleRecords.drop(2))
    val df = WarcIO.read(spark, s"$dir/*")
    assert(df.count() === sampleRecords.size.toLong)
    assert(df.select("src_file").distinct().count() === 2L)
  }

  test("responses(): keeps response records, strips the HTTP envelope") {
    val path = tmpDir() + "/t.warc"
    WarcIO.write(path, sampleRecords)
    val resp = WarcIO.responses(WarcIO.read(spark, path))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(resp.keySet === Set("http://example.com/a", "http://example.com/empty"))
    assert(resp("http://example.com/a") ===
      "<html><body><p>Hello WARC</p></body></html>")
    assert(resp("http://example.com/empty") === "")
  }

  test("conversions(): WET-shape plain-text records decode as UTF-8") {
    val path = tmpDir() + "/t.wet"
    WarcIO.write(path, Seq(
      WarcRecord("conversion", Some("http://example.com/a"), None,
        Some("text/plain"), Some("<urn:uuid:wet-1>"),
        "extracted text body".getBytes(UTF_8)),
      sampleRecords.head))
    val got = WarcIO.conversions(WarcIO.read(spark, path))
      .collect().map(r => r.getString(0) -> r.getString(2))
    assert(got.toSeq === Seq("http://example.com/a" -> "extracted text body"))
  }

  test("end-to-end crawl intake: WARC -> responses -> htmlToText") {
    import org.apache.spark.sql.functions._
    val path = tmpDir() + "/t.warc.gz"
    WarcIO.write(path, sampleRecords, gzipPerRecord = true)
    val txt = WarcIO.responses(WarcIO.read(spark, path))
      .filter(col("target_uri") === "http://example.com/a")
      .select(graft.operators.WebOps.htmlToText(col("html")).as("text"))
      .collect().head.getString(0)
    assert(txt === "Hello WARC")
  }

  test("corrupt inputs fail loudly") {
    val dir = tmpDir()
    val bad = s"$dir/bad.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "HTTP/1.1 200 OK\r\nnot a warc\r\n".getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.read(spark, bad).count()
    }
    assert(e.getMessage.contains("not a WARC record header") ||
      Option(e.getCause).exists(_.getMessage.contains("not a WARC record header")))

    val trunc = s"$dir/trunc.warc"
    WarcIO.write(s"$dir/ok.warc", sampleRecords.take(3))
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/ok.warc"))
    java.nio.file.Files.write(java.nio.file.Paths.get(trunc),
      bytes.take(bytes.length - 30))
    intercept[org.apache.spark.SparkException] {
      WarcIO.read(spark, trunc).count()
    }
  }
}
