package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 eighth batch vs hand references: PII census and temporal
  * split audit. */
class Round13hOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // piiCensus
  // ------------------------------------------------------------------

  test("piiCensus: per-source doc/hit accounting matches the redaction " +
      "semantics; clean docs lower the permille") {
    import spark.implicits._
    val rows = Seq(
      ("s1", "mail a@b.com and c@d.org plus ip 10.0.0.1"),
      ("s1", "nothing sensitive here"),
      ("s2", "call 25-123-456-7890 now"),
      ("s2", "also clean"), ("s2", "more clean"))
    val got = TextOps.piiCensus(rows.toDF("src", "text"), "text", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // s1: 2 docs, 1 with PII (2 emails + 1 ip), permille 500
    assert(got("s1") == ((2L, 1L, 500L, 2L, 1L, 0L)))
    // s2: 3 docs, 1 with PII (1 phone), permille 333
    assert(got("s2") == ((3L, 1L, 333L, 0L, 0L, 1L)))
  }

  // ------------------------------------------------------------------
  // temporalSplitAudit
  // ------------------------------------------------------------------

  test("temporalSplitAudit: clean boundary flags ok with zero leaks; " +
      "planted leakage is counted; same-instant tie is a leak") {
    import spark.implicits._
    // train: 0..100s; val: 150..200s EXCEPT one leaked row at 50s and
    // one tie row at exactly train's max (100s); test: 300s+
    val rows = Seq(
      ("train", 0L), ("train", 50000L), ("train", 100000L),
      ("val", 50000L), ("val", 100000L), ("val", 150000L),
      ("val", 200000L),
      ("test", 300000L), ("test", 310000L))
    val got = SamplingOps.temporalSplitAudit(
        rows.toDF("split", "ms")
          .withColumn("ts", timestamp_millis(col("ms"))),
        "split", "ts", Seq("train", "val", "test"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(6), r.getLong(7),
          r.getLong(8))).toMap
    val tv = got(("train", "val"))
    assert(tv == ((3L, 4L, false, 50000L, 2L)),
      s"train->val: $tv (leaks = the 50s row AND the 100s tie)")
    val vt = got(("val", "test"))
    assert(vt == ((4L, 2L, true, 0L, 0L)))
  }

  test("temporalSplitAudit: label mismatch between data and declared " +
      "order fails loudly in both directions") {
    import spark.implicits._
    val df = Seq(("train", 0L), ("oops", 1L)).toDF("split", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val e1 = intercept[IllegalArgumentException] {
      SamplingOps.temporalSplitAudit(df, "split", "ts",
        Seq("train", "val"))
    }
    assert(e1.getMessage.contains("must match"))
    val e2 = intercept[IllegalArgumentException] {
      SamplingOps.temporalSplitAudit(df, "split", "ts", Seq("train"))
    }
    assert(e2.getMessage.contains(">= 2"))
  }

  test("temporalSplitAudit: int-labeled splits audit against string " +
      "order labels; an all-NULL-timestamp split fails with the " +
      "operator's message, not an unboxing NPE") {
    import spark.implicits._
    // integer split labels: the base projection casts to string
    val intLabeled = Seq((0, 0L), (0, 10000L), (1, 20000L), (1, 30000L))
      .toDF("split", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = SamplingOps.temporalSplitAudit(intLabeled, "split", "ts",
        Seq("0", "1")).collect()
    assert(got.length == 1 && got.head.getBoolean(6))
    // a split whose timestamps are all NULL: loud, descriptive
    val nullTs = Seq((Some("train"), Some(0L)), (Some("val"), None))
      .toDF("split", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val e = intercept[IllegalArgumentException] {
      SamplingOps.temporalSplitAudit(nullTs, "split", "ts",
        Seq("train", "val"))
    }
    assert(e.getMessage.contains("no non-null"), e.getMessage)
  }
}
