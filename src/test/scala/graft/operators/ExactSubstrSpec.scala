package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactSubstr (duplicated-substring) dedup: span detection, keep-first
  * semantics, merge behavior, excision, and the hashed-key scale variant. */
class ExactSubstrSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Int, Int)]] =
    df.collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getInt(0), s.getInt(1)))
    }.toMap

  test("cross-doc shared substring flags only the later occurrence") {
    // shared 10-char region "0123456789" at doc1 pos 5, doc2 pos 0
    val d = docs(
      (1L, "AAAAA0123456789ZZZZZ"),
      (2L, "0123456789BBBBBBBBBB"))
    val sp = spansOf(DedupOps.duplicatedSubstringSpans(d, "doc_id", "text", 10))
    assert(sp(1L) == Seq.empty)          // first occurrence kept
    assert(sp(2L) == Seq((0, 10)))       // later copy flagged
    val cleaned = DedupOps.removeDuplicatedSubstrings(d, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "AAAAA0123456789ZZZZZ")
    assert(cleaned(2L) == "BBBBBBBBBB")
  }

  test("longer shared region merges overlapping windows into one span") {
    // 15 shared chars, L=10 -> starts 0..5 in each copy merge to [., .+15)
    val shared = "abcdefghijklmno"
    val d = docs((1L, "XX" + shared + "YY"), (2L, shared + "QQQQ"))
    val sp = spansOf(DedupOps.duplicatedSubstringSpans(d, "doc_id", "text", 10))
    assert(sp(1L) == Seq.empty)
    assert(sp(2L) == Seq((0, 15)))
  }

  test("within-doc repeat keeps the first position") {
    val d = docs((7L, "0123456789__0123456789"))
    val sp = spansOf(DedupOps.duplicatedSubstringSpans(d, "doc_id", "text", 10))
    assert(sp(7L) == Seq((12, 22)))
    val out = DedupOps.removeDuplicatedSubstrings(d, "doc_id", "text", 10)
      .collect().head.getString(1)
    assert(out == "0123456789__")
  }

  test("keepFirst=false flags every occurrence") {
    val d = docs(
      (1L, "AAAAA0123456789ZZZZZ"),
      (2L, "0123456789BBBBBBBBBB"))
    val sp = spansOf(
      DedupOps.duplicatedSubstringSpans(d, "doc_id", "text", 10, keepFirst = false))
    assert(sp(1L) == Seq((5, 15)))
    assert(sp(2L) == Seq((0, 10)))
  }

  test("disjoint duplicated regions produce separate spans; full-dup doc empties") {
    val a = "aaaaaaaaaa" // 10
    val b = "bbbbbbbbbb"
    val d = docs(
      (1L, a + "XXXX" + b),          // first occurrences
      (2L, a + "YYYY" + b),          // both regions flagged, gap 4 > 0 kept
      (3L, a + "XXXX" + b))          // identical to doc 1 -> fully flagged
    val sp = spansOf(DedupOps.duplicatedSubstringSpans(d, "doc_id", "text", 10))
    assert(sp(1L) == Seq.empty)
    assert(sp(2L) == Seq((0, 10), (14, 24)))
    assert(sp(3L) == Seq((0, 24)))
    val cleaned = DedupOps.removeDuplicatedSubstrings(d, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(2L) == "YYYY")
    assert(cleaned(3L) == "")
  }

  test("docs shorter than minLen never flag; unique docs untouched") {
    val d = docs((1L, "short"), (2L, "a perfectly unique sentence here"))
    val sp = spansOf(DedupOps.duplicatedSubstringSpans(d, "doc_id", "text", 10))
    assert(sp(1L) == Seq.empty && sp(2L) == Seq.empty)
    val rep = DedupOps.exactSubstrDedupReport(d, "doc_id", "text", 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rep.forall(t => t._2 == 0 && t._3 == 0))
    assert(rep.map(t => t._1 -> t._4).toMap ==
      Map(1L -> "short", 2L -> "a perfectly unique sentence here"))
  }

  test("report counts spans and removed chars; other columns pass through remove") {
    val d = docs(
      (1L, "0123456789_ABCDEFGHIJ"),
      (2L, "0123456789=ABCDEFGHIJ"))
      .withColumn("extra", col("doc_id") * 2)
    val rep = DedupOps.exactSubstrDedupReport(d, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(rep(1L) == ((0, 0, "0123456789_ABCDEFGHIJ")))
    assert(rep(2L) == ((2, 20, "=")))
    val kept = DedupOps.removeDuplicatedSubstrings(d, "doc_id", "text", 10)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "extra"))
    assert(kept.filter(col("doc_id") === 2).collect().head.getLong(2) == 4L)
  }

  test("hashGrams variant agrees with exact keys on real-shaped data") {
    import spark.implicits._
    // word-pool text like the documents table: ample repeated substrings
    val pool = Vector("key", "agg", "row", "scan", "slow", "fast", "table")
    val rows = (0L until 60L).map { i =>
      i -> (0 until 40).map(j => pool(((i * 31 + j * 7) % 7).toInt)).mkString(" ")
    }
    val d = rows.toDF("doc_id", "text")
    val exact = DedupOps.exactSubstrDedupReport(d, "doc_id", "text", 20)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val hashed = DedupOps.exactSubstrDedupReport(
        d, "doc_id", "text", 20, hashGrams = true)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(exact == hashed)
    // sanity: this corpus actually deduplicates
    assert(exact.values.exists(_.isEmpty) || exact.values.exists(v =>
      v.length < rows.toMap.apply(0L).length))
  }

  test("excision complement: kept + removed chars == original length") {
    val d = docs(
      (1L, "0123456789ABCDEFGHIJKLMNOPQRST"),
      (2L, "xx0123456789yyABCDEFGHIJzz"),
      (3L, "KLMNOPQRST0123456789"))
    val rep = DedupOps.exactSubstrDedupReport(d, "doc_id", "text", 10)
      .collect()
    val orig = Map(1L -> 30, 2L -> 26, 3L -> 20)
    rep.foreach { r =>
      assert(r.getString(3).length + r.getInt(2) == orig(r.getLong(0)))
    }
  }
}
