package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 ninth batch vs hand references: single-scan numeric profile
  * and per-column hash-bucket drift. */
class Round13iOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // numericProfile
  // ------------------------------------------------------------------

  test("numericProfile: exact integer-floor mean/variance, null " +
      "accounting, negative-mean floor semantics") {
    import spark.implicits._
    // a: {2, 4, 9} -> sum 15, mean floor(15/3)=5,
    // var = (3*101 - 225) / 9 = 78/9 -> floor 8
    // b: {-5, -2, null} -> sum -7, mean floor(-7/2) = -4 (floor, not
    // trunc), var = (2*29 - 49)/4 = 9/4 -> 2
    val rows = Seq((Some(2L), Some(-5L)), (Some(4L), Some(-2L)),
      (Some(9L), None))
    val got = ProfileOps.numericProfile(rows.toDF("a", "b"),
        Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 0L)
    assert(a.getLong(3) == 2L && a.getLong(4) == 9L)
    assert(a.getLong(5) == 15L && a.getLong(6) == 5L &&
      a.getLong(7) == 8L)
    val b = got("b")
    assert(b.getLong(2) == 1L, "one null in b")
    assert(b.getLong(5) == -7L)
    assert(b.getLong(6) == -4L, "floor division, not truncation")
    assert(b.getLong(7) == 2L)
  }

  test("numericProfile: an all-null column reports NULL stats, not a " +
      "crash") {
    import spark.implicits._
    val got = ProfileOps.numericProfile(
      Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
        .toDF("x", "dead"), Seq("dead")).head()
    assert(got.getLong(2) == 2L)
    assert(got.isNullAt(6) && got.isNullAt(7))
  }

  // ------------------------------------------------------------------
  // columnDrift
  // ------------------------------------------------------------------

  test("columnDrift: identical snapshots score exactly 0 per column; " +
      "a shifted column scores > 0 while the stable one stays 0") {
    import spark.implicits._
    val a = (1L to 200L).map(i => (s"v${i % 5}", s"s${i % 3}"))
      .toDF("lang", "source")
    val same = ProfileOps.columnDrift(a, a, Seq("lang", "source"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(same("lang") == 0.0 && same("source") == 0.0)
    val b = (1L to 200L).map(i =>
        (if (i % 2 == 0) "zz" else s"v${i % 5}", s"s${i % 3}"))
      .toDF("lang", "source")
    val drift = ProfileOps.columnDrift(a, b, Seq("lang", "source"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(drift("lang") > 0.25, s"shifted column: ${drift("lang")}")
    assert(drift("source") == 0.0, "stable column stays 0")
  }

  test("columnDrift: NULL values are their own bucket; non-power-of-2 " +
      "buckets fail loudly") {
    import spark.implicits._
    val a = Seq(Some("x"), None, None).toDF("c")
    val b = Seq(Some("x"), Some("x"), None).toDF("c")
    val got = ProfileOps.columnDrift(a, b, Seq("c")).head()
    assert(got.getLong(1) == 3L && got.getLong(2) == 3L)
    assert(got.getDouble(3) > 0.0, "null-share shift must register")
    val e = intercept[IllegalArgumentException] {
      ProfileOps.columnDrift(a, b, Seq("c"), buckets = 63)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
