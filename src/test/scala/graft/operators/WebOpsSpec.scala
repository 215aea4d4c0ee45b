package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebOpsSpec extends SparkSpec {
  import WebOps.{canonicalize, extractText}

  // ------------------------------ HTML ------------------------------------

  test("extractText strips tags and normalizes whitespace") {
    assert(extractText("<p>hello   <b>world</b></p>") == "hello world")
    assert(extractText("<div>a</div><div>b</div>") == "a\nb")
    assert(extractText("a<br>b") == "a\nb")
    assert(extractText("a<span>b</span>c") == "abc")
  }

  test("extractText drops script/style content entirely") {
    val html = """<script>var a = "</b> <p>not text</p>";</script>x"""
    assert(extractText(html) == "x")
    assert(extractText("<style>p { color: red; }</style>y") == "y")
    assert(extractText("<SCRIPT>hidden</SCRIPT>z") == "z")
    assert(extractText("<svg viewBox=\"0 0 1 1\"><rect/></svg>ok") == "ok")
    assert(extractText("<svg/>ok") == "ok") // self-closing drop container
    assert(extractText("<script>never closed") == "")
  }

  test("extractText drops comments, doctype and PIs; keeps CDATA text") {
    assert(extractText("<!-- a <p>b</p> -->c") == "c")
    assert(extractText("<!DOCTYPE html><p>d</p>") == "d")
    assert(extractText("<?xml version=\"1.0\"?>e") == "e")
    assert(extractText("<![CDATA[1 < 2 & x]]>") == "1 < 2 & x")
  }

  test("extractText decodes entities; malformed '&' stays literal") {
    assert(extractText("a&amp;b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ==
      "a&b <c> \"d\" 'e'")
    assert(extractText("x&nbsp;y") == "x y")
    assert(extractText("&#97;&#x62;&#X43;") == "abC")
    assert(extractText("fish & chips") == "fish & chips")
    assert(extractText("&unknown; &#xzz; &#;") == "&unknown; &#xzz; &#;")
    assert(extractText("&#55296;") == "&#55296;") // surrogate cp rejected
  }

  test("extractText is quote-aware inside attributes") {
    assert(extractText("""<a href="x>y" title='p>q'>link</a>""") == "link")
    assert(extractText("""<div data-x="a>b">t</div>""") == "t")
  }

  test("extractText keeps stray '<' as text") {
    assert(extractText("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
  }

  test("extractText trims lines and drops empty ones") {
    val html = "<p>  one  two </p>\n\n<p></p><p> three\tfour </p>"
    assert(extractText(html) == "one two\nthree four")
    assert(extractText("") == "")
    assert(extractText(null) == "")
    assert(extractText("<p>   </p>") == "")
  }

  test("htmlToText column matches the pure function") {
    import spark.implicits._
    val rows = Seq(
      "<html><body><h1>T&nbsp;1</h1><p>a &amp; b</p></body></html>",
      "<script>x</script><div>plain</div>")
    val got = rows.toDF("html")
      .select(WebOps.htmlToText(col("html")).as("t"))
      .as[String].collect().toSeq
    assert(got == rows.map(extractText))
  }

  // ------------------------------- URL ------------------------------------

  test("canonicalize lowercases scheme/host, strips www and fragment") {
    assert(canonicalize("HTTP://WWW.Example.COM/Path#frag") ==
      "http://example.com/Path")
    assert(canonicalize("https://Sub.WWW.example.com/") ==
      "https://sub.www.example.com") // only a LEADING www. strips
  }

  test("canonicalize drops default ports, keeps others") {
    assert(canonicalize("http://a.com:80/x") == "http://a.com/x")
    assert(canonicalize("https://a.com:443/x") == "https://a.com/x")
    assert(canonicalize("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(canonicalize("https://a.com:80/x") == "https://a.com:80/x")
  }

  test("canonicalize path: trailing slashes removed, case kept") {
    assert(canonicalize("http://a.com/") == "http://a.com")
    assert(canonicalize("http://a.com") == "http://a.com")
    assert(canonicalize("http://a.com/A/B///") == "http://a.com/A/B")
  }

  test("canonicalize sorts query params and drops tracking keys") {
    assert(canonicalize("http://a.com/p?b=2&a=1") == "http://a.com/p?a=1&b=2")
    assert(canonicalize(
      "http://a.com/p?utm_source=x&a=1&gclid=g&fbclid=f&utm_medium=y") ==
      "http://a.com/p?a=1")
    assert(canonicalize("http://a.com/p?utm_source=x") == "http://a.com/p")
    assert(canonicalize("http://a.com/p?a=1&&a=1") == "http://a.com/p?a=1&a=1")
    // ref is tracking; refresh is not (whole-key match, not prefix)
    assert(canonicalize("http://a.com/p?ref=tw&refresh=1") ==
      "http://a.com/p?refresh=1")
  }

  test("canonicalize passes through non-absolute strings trimmed") {
    assert(canonicalize("  /relative/path  ") == "/relative/path")
    assert(canonicalize("not a url") == "not a url")
    assert(canonicalize(null) == null)
  }

  test("urlDedup groups by canonical form, keeps smallest id") {
    import spark.implicits._
    val df = Seq(
      (3L, "http://WWW.a.com/x?b=2&a=1"),
      (1L, "https://other.com/"),
      (7L, "http://a.com/x/?a=1&b=2&utm_source=s"),
      (5L, "http://a.com:80/x?a=1&b=2#frag")
    ).toDF("doc_id", "url")
    val got = WebOps.urlDedup(df, "url", "doc_id")
      .orderBy("url").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (3L, "http://a.com/x?a=1&b=2", 3L),
      (1L, "https://other.com", 1L)))
  }
}
