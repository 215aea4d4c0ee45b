package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class CoverageOpsSpec extends SparkSpec {

  test("toCoverage matches brute-force depth") {
    import spark.implicits._
    val iv = Seq(
      ("chr1", 0L, 5L), ("chr1", 3L, 8L), ("chr1", 3L, 4L), ("chr2", 0L, 2L))
      .toDF("referenceName", "start", "end")
    val cov = CoverageOps.toCoverage(iv)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    def depth(ref: String, p: Long): Long =
      Seq(("chr1", 0L, 5L), ("chr1", 3L, 8L), ("chr1", 3L, 4L), ("chr2", 0L, 2L))
        .count(t => t._1 == ref && t._2 <= p && p < t._3)
    for (p <- 0L until 10L) {
      val d = depth("chr1", p)
      if (d > 0) assert(cov(("chr1", p)) == d, s"pos $p")
      else assert(!cov.contains(("chr1", p)))
    }
  }

  test("collapse merges equal adjacent runs; flatten inverts") {
    import spark.implicits._
    val cov = Seq(
      ("chr1", 0L, 1L, 2L), ("chr1", 1L, 2L, 2L), ("chr1", 2L, 3L, 3L),
      ("chr1", 4L, 5L, 3L), ("chr2", 0L, 1L, 1L))
      .toDF("referenceName", "start", "end", "count")
    val collapsed = CoverageOps.collapse(cov)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(collapsed == Set(
      ("chr1", 0L, 2L, 2L),   // merged equal run
      ("chr1", 2L, 3L, 3L),   // different count not merged
      ("chr1", 4L, 5L, 3L),   // gap not merged
      ("chr2", 0L, 1L, 1L)))
    val flat = CoverageOps.flatten(CoverageOps.collapse(cov))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val orig = cov.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(flat == orig)
  }

  test("collapseBinned equals plain collapse incl. runs crossing bin edges") {
    import spark.implicits._
    val rnd = new Random(41)
    // random per-base depths over two contigs: long equal-depth runs will
    // frequently cross the tiny 50-base bins
    val rows = Seq.newBuilder[(String, Long, Long, Long)]
    for (ref <- Seq("chr1", "chr2")) {
      var p = 0L
      while (p < 1000L) {
        val runLen = 1L + rnd.nextInt(120)
        val depth = 1L + rnd.nextInt(3)
        var i = 0L
        while (i < runLen && p + i < 1000L) {
          rows += ((ref, p + i, p + i + 1, depth))
          i += 1
        }
        p += runLen
      }
    }
    val cov = rows.result().toDF("referenceName", "start", "end", "count")
    def keySet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = keySet(CoverageOps.collapse(cov))
    val binned = keySet(CoverageOps.collapseBinned(cov, binSize = 50L))
    assert(binned == plain)
  }

  test("property: collapse(flatten(x)) preserves per-base depth") {
    import spark.implicits._
    val rnd = new Random(11)
    val iv = (0 until 200).map { _ =>
      val s = rnd.nextLong(300L)
      ("chr" + (rnd.nextInt(2) + 1), s, s + 1 + rnd.nextLong(30L))
    }.toDF("referenceName", "start", "end")
    val cov = CoverageOps.toCoverage(iv)
    val roundTrip = CoverageOps.flatten(CoverageOps.collapse(cov))
    val a = cov.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val b = roundTrip.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(a == b)
  }

  test("aggregatedCoverage bins weighted by covered bases") {
    import spark.implicits._
    val cov = Seq(("chr1", 0L, 10L, 4L), ("chr1", 10L, 20L, 2L))
      .toDF("referenceName", "start", "end", "count")
    val agg = CoverageOps.aggregatedCoverage(cov, 20L).collect()
    assert(agg.length == 1)
    assert(agg.head.getAs[Long]("totalCount") == 60L) // 10*4 + 10*2
    assert(agg.head.getAs[Long]("nBases") == 20L)
  }
}
