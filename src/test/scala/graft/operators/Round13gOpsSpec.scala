package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 seventh batch vs hand references: pre-join cardinality
  * probe and per-transition latency percentiles. */
class Round13gOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // joinSizeProbe
  // ------------------------------------------------------------------

  test("joinSizeProbe: exact sum/max of per-key count products, null " +
      "keys excluded, disjoint keys contribute nothing") {
    import spark.implicits._
    // a: k1 x3, k2 x1, k9 x2, null x1; b: k1 x2, k2 x5, k7 x1
    // join rows = 3*2 + 1*5 = 11; max key = 6 (k1)
    val a = Seq(Some("k1"), Some("k1"), Some("k1"), Some("k2"),
      Some("k9"), Some("k9"), None).toDF("k")
    val b = Seq("k1", "k1", "k2", "k2", "k2", "k2", "k2", "k7").toDF("k")
    val got = SkewOps.joinSizeProbe(a, "k", b, "k").head()
    assert(got.getLong(0) == 3L, "n_keys_a excludes null")
    assert(got.getLong(1) == 3L)
    assert(got.getLong(2) == 2L, "common keys")
    assert(got.getLong(3) == 6L && got.getLong(4) == 8L)
    assert(got.getLong(5) == 11L, s"join_rows ${got.getLong(5)}")
    assert(got.getLong(6) == 6L, s"max_key_rows ${got.getLong(6)}")
    // the probe's prediction equals the materialized join size
    val real = a.filter(col("k").isNotNull).join(b, "k").count()
    assert(real == got.getLong(5))
  }

  test("joinSizeProbe: fully disjoint sides report a 0-row join, not " +
      "an empty result") {
    import spark.implicits._
    val got = SkewOps.joinSizeProbe(
      Seq("a").toDF("k"), "k", Seq("b").toDF("k"), "k").head()
    assert(got.getLong(2) == 0L && got.getLong(5) == 0L &&
      got.getLong(6) == 0L)
  }

  // ------------------------------------------------------------------
  // transitionLatency
  // ------------------------------------------------------------------

  test("transitionLatency: gaps attribute to the (prev->cur) pair, " +
      "keys never cross, disc percentiles exact") {
    import spark.implicits._
    // user u: a@0s, b@10s, b@25s, c@26s -> a->b 10000, b->b 15000,
    // b->c 1000; user v: a@0s, b@2s -> a->b 2000
    val rows = Seq(("u", "a", 0L, 1L), ("u", "b", 10000L, 2L),
      ("u", "b", 25000L, 3L), ("u", "c", 26000L, 4L),
      ("v", "a", 1000000L, 5L), ("v", "b", 1002000L, 6L))
    val got = Sessionize.transitionLatency(
        rows.toDF("u", "t", "ms", "id")
          .withColumn("ts", timestamp_millis(col("ms"))),
        "u", "t", "ts", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // a->b gaps {10000, 2000}: n=2, p50 = value at rank ceil(1.0)=1
    // ascending -> 2000; p99 rank ceil(1.98)=2 -> 10000
    assert(got("a->b") == ((2L, 2000L, 10000L)))
    assert(got("b->b") == ((1L, 15000L, 15000L)))
    assert(got("b->c") == ((1L, 1000L, 1000L)))
    assert(!got.contains("c->a"), "cross-user transition must not exist")
  }
}
