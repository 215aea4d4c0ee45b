package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 contract fixes (ADVICE.md round 11): modularity's singleton
  * fallback must not collide with numeric label values, and
  * dyadicTrailingMean's numerator must never silently wrap long. */
class Round12FixSpec extends SparkSpec {

  test("modularity: unlabeled node whose id EQUALS a numeric label " +
      "stays a singleton (no namespace collision with label values)") {
    import spark.implicits._
    // Path 1-2-3. Labels: node 1 and node 2 both labeled 3 (LPA-style
    // numeric labels ARE node ids); node 3 is UNLABELED. Before the fix,
    // node 3's fallback community was the string "3" == label 3, so edge
    // (2,3) counted as within and D_c merged node 3's degree into the
    // label-3 community. Correct: node 3 is a singleton __singleton_3.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, 3L), (2L, 3L)).toDF("id", "label")
    val r = GraphOps.modularity(edges, labels).collect().head
    assert(r.getAs[Long]("m") == 2L)
    // only (1,2) is within; (2,3) crosses into the singleton
    assert(r.getAs[Long]("n_within") == 1L)
    // D_{3} = deg(1)+deg(2) = 3, D_{singleton} = 1 -> sum sq = 10
    val want = 1.0 / 2.0 - 10.0 / (4.0 * 4.0)
    assert(math.abs(r.getAs[Double]("q_modularity") - want) < 1e-12)
  }

  test("dyadicTrailingMean: window*value past long range gives exact " +
      "smoothed and NULL num, never a wrapped numerator") {
    import spark.implicits._
    // window=50, values ~2^30: top weight 2^49, num ~ 2^79 >> Long.Max.
    // The decimal(38,0) path keeps `smoothed` exact; the long-schema
    // `num` surfaces as NULL instead of a silent wraparound.
    val v = 1L << 30
    val series = (0 until 60).map(d => ("t", d.toLong, v))
    val got = TimeSeriesOps.dyadicTrailingMean(
        series.toDF("g", "day", "v"), "g", "day", "v", window = 50)
      .filter(col("day") === 59).collect().head
    // constant series -> smoothed is exactly the constant at any window
    assert(got.getAs[Double]("smoothed") == v.toDouble)
    assert(got.isNullAt(got.fieldIndex("num")), "overflowed num must be NULL")
    assert(got.getAs[Long]("den") == (1L << 50) - 1)
    // in-range regime unchanged: same series, window=8 -> exact longs
    val small = TimeSeriesOps.dyadicTrailingMean(
        series.toDF("g", "day", "v"), "g", "day", "v", window = 8)
      .filter(col("day") === 59).collect().head
    assert(small.getAs[Long]("num") == v * 255L)
    assert(small.getAs[Long]("den") == 255L)
  }

  test("waterFillAllocation fraction overload == Long overload at " +
      "budget = floor(total * num / den), including non-dyadic fractions") {
    import spark.implicits._
    val counts = Seq(("a", 100L, 3L), ("b", 999L, 1L), ("c", 40L, 5L),
      ("d", 7L, 2L), ("e", 3000L, 1L)).toDF("src", "avail", "w")
    val total = 100L + 999L + 40L + 7L + 3000L
    for ((n, d) <- Seq((1L, 2L), (1L, 3L), (7L, 9L), (0L, 1L), (5L, 4L))) {
      val want = SamplingOps.waterFillAllocation(
          counts, "src", "avail", "w", total * n / d)
        .orderBy("source").collect().toSeq
      val got = SamplingOps.waterFillAllocation(
          counts, "src", "avail", "w", budgetNum = n, budgetDen = d)
        .orderBy("source").collect().toSeq
      assert(got == want, s"fraction $n/$d")
    }
  }
}
