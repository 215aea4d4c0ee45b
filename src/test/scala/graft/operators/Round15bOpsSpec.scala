package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 batch B vs hand references: ECE calibration bins, trimmed
  * mean, Atkinson index, median/MAD. */
class Round15bOpsSpec extends SparkSpec {

  test("calibrationBins: hand bins, exact permille rates, broadcast " +
      "ECE, conf=1000 clamps into the top bin, out-of-range excluded") {
    import spark.implicits._
    val rows = Seq((50L, true), (150L, false), (150L, true),
      (950L, true), (1000L, true), // clamps to bin 9
      (1001L, true), (-5L, true)) // out of range -> excluded
    val got = LabelQaOps.calibrationBins(
        rows.toDF("conf", "ok"), "conf", "ok")
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // bin 9 holds conf 950 and 1000: n=2 sc=1950 -> conf 975, acc 1000
    // ece = (1*950 + 2*350 + 2*25) div 5 = 1700 div 5 = 340
    assert(got == Map(
      0 -> ((1L, 50L, 1000L, 950L, 340L)),
      1 -> ((2L, 150L, 500L, 350L, 340L)),
      9 -> ((2L, 975L, 1000L, 25L, 340L))), got.toString)
  }

  test("trimmedMeanByGroup: exact 10/90 trim of 1..10, degenerate " +
      "full-trim reports NULL") {
    import spark.implicits._
    val rows = (1L to 10L).map(v => ("g", v, v))
    val got = Stats.trimmedMeanByGroup(rows.toDF("g", "v", "t"),
        "g", "v", "t", loPermille = 100, hiPermille = 900).head()
    // drop rank 1 and rank 10 -> mean of 2..9 = 44/8 = 5.5
    assert(got.getLong(1) == 10L && got.getLong(2) == 8L &&
      got.getDouble(3) == 5.5, got.toString)
    val empty = Stats.trimmedMeanByGroup(rows.toDF("g", "v", "t"),
        "g", "v", "t", loPermille = 0, hiPermille = 0).head()
    assert(empty.getLong(2) == 0L && empty.isNullAt(3), empty.toString)
  }

  test("rankWithinGroups escalation: the two-phase distributed rank " +
      "produces EXACTLY the window path's results (r16: dominant-group " +
      "auto-escalation), mixed small+big groups route independently") {
    import spark.implicits._
    // "big" has 5000 rows (spans many of the 32 shuffle partitions when
    // range-partitioned), "tiny" has 7 — with escalateGroupRows = 100
    // one group escalates and the other stays on the window path
    val rows = ((1L to 5000L).map(v => ("big", (v * 2654435761L) %
      100000L, v)) ++ (1L to 7L).map(v => ("tiny", v * 3L, v)))
      .toDF("g", "v", "t")
    val windowed = Stats.trimmedMeanByGroup(rows, "g", "v", "t",
      loPermille = 100, hiPermille = 900)
    val escalated = Stats.trimmedMeanByGroup(rows, "g", "v", "t",
      loPermille = 100, hiPermille = 900, escalateGroupRows = 100L)
    assert(escalated.collect().toSet == windowed.collect().toSet,
      "escalated trim must be bit-identical to the window path")
    val windowedMad = Stats.madByGroup(rows, "g", "v", "t")
    val escalatedMad = Stats.madByGroup(rows, "g", "v", "t",
      escalateGroupRows = 100L)
    assert(escalatedMad.collect().toSet == windowedMad.collect().toSet,
      "escalated MAD must be bit-identical to the window path")
  }

  test("atkinsonIndex: even distribution = exactly 0, hand chain for " +
      "[1,3], non-positive values excluded") {
    import spark.implicits._
    val even = Stats.atkinsonIndex(
      Seq(("g", 5L), ("g", 5L), ("g", 5L)).toDF("g", "v"), "g", "v")
      .head()
    assert(even.getLong(1) == 3L && even.getDouble(2) == 0.0,
      even.toString)
    val got = Stats.atkinsonIndex(
      Seq(("g", 1L), ("g", 3L), ("g", 0L), ("g", -7L))
        .toDF("g", "v"), "g", "v").head()
    val q = 1000000000000L + 1000000000000L / 3L
    val expected = 1.0 -
      ((2L * 1000000000000L).toDouble / q.toDouble) * (2.0 / 4.0)
    assert(got.getLong(1) == 2L && got.getDouble(2) == expected,
      s"$got vs $expected")
  }

  test("madByGroup: hand median and MAD, outlier-robust, even-n disc " +
      "rank") {
    import spark.implicits._
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 100L), ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
    val got = Stats.madByGroup(rows.toDF("g", "v", "t"), "g", "v", "t")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // a: median rank 3 of [1,2,3,4,100] = 3; devs sorted
    // (0,3),(1,2),(1,4),(2,1),(97,100) -> rank 3 dev = 1
    assert(got("a") == ((5L, 3L, 1L)), got.toString)
    // b: rank (4+1) div 2 = 2 -> median 2; devs (0,2),(1,1),(1,3),(2,4)
    // -> rank 2 dev = 1
    assert(got("b") == ((4L, 2L, 1L)))
  }
}
