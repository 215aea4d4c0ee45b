package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** The binned overlap join must be EXACTLY the naive theta-join, for every
  * join type, bin size (incl. intervals longer than a bin) and flank
  * (pattern of the reference's InnerShuffleRegionJoinSuite /
  * OuterRegionJoinSuite; here checked against the naive Spark join). */
class RegionJoinSpec extends SparkSpec {

  private def randomIntervals(n: Int, seed: Long, maxLen: Long): DataFrame = {
    val rnd = new Random(seed)
    import spark.implicits._
    (0 until n).map { i =>
      val ref = "chr" + (rnd.nextInt(3) + 1)
      val start = rnd.nextLong(5000L)
      (ref, start, start + 1 + rnd.nextLong(maxLen), i.toLong)
    }.toDF("referenceName", "start", "end", "id")
  }

  private def naive(l: DataFrame, r: DataFrame, joinType: String, flank: Long): Set[(Option[Long], Option[Long])] = {
    val lr = l.select(col("referenceName").as("lref"), col("start").as("ls"),
      col("end").as("le"), col("id").as("lid"))
    val rr = r.select(col("referenceName").as("rref"), col("start").as("rs"),
      col("end").as("re"), col("id").as("rid"))
    lr.join(rr,
        col("lref") === col("rref") &&
          col("ls") < col("re") + flank && col("rs") < col("le") + flank,
        joinType)
      .select("lid", "rid").collect()
      .map(row => (Option(row.get(0)).map(_.asInstanceOf[Long]),
        Option(row.get(1)).map(_.asInstanceOf[Long]))).toSet
  }

  private def binnedResult(l: DataFrame, r: DataFrame, joinType: String,
      binSize: Long, flank: Long): Set[(Option[Long], Option[Long])] =
    RegionJoins.overlapJoin(l, r, joinType, binSize, flank)
      .select("l_id", "r_id").collect()
      .map(row => (Option(row.get(0)).map(_.asInstanceOf[Long]),
        Option(row.get(1)).map(_.asInstanceOf[Long]))).toSet

  for (joinType <- Seq("inner", "left_outer", "right_outer", "full_outer");
       binSize <- Seq(100L, 1000L)) {
    test(s"binned $joinType (bin=$binSize) == naive join") {
      // maxLen 400 > binSize 100: intervals span multiple bins
      val l = randomIntervals(300, seed = 1, maxLen = 400)
      val r = randomIntervals(200, seed = 2, maxLen = 150)
      assert(binnedResult(l, r, joinType, binSize, 0L) ==
        naive(l, r, joinType, 0L))
    }
  }

  test("flanked inner join == naive with tolerance") {
    val l = randomIntervals(200, seed = 3, maxLen = 100)
    val r = randomIntervals(200, seed = 4, maxLen = 100)
    for (flank <- Seq(1L, 50L, 500L)) {
      assert(binnedResult(l, r, "inner", 1000L, flank) ==
        naive(l, r, "inner", flank), s"flank=$flank")
    }
  }

  test("groupByLeft matches per-left overlap sets") {
    val l = randomIntervals(100, seed = 5, maxLen = 200)
    val r = randomIntervals(100, seed = 6, maxLen = 200)
    val grouped = RegionJoins.overlapJoinGroupByLeft(
        l, r, rightStructCols = Seq("id"), outer = true, binSize = 500L)
      .select(col("id"), expr("transform(overlaps, x -> x.id)").as("rids"))
      .collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Long](1).toSet).toMap
    val expected = naive(l, r, "left_outer", 0L)
      .groupBy(_._1.get)
      .view.mapValues(_.flatMap(_._2).toSet).toMap
    assert(grouped.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(grouped(k) == v, s"left id $k") }
  }

  test("overlapCounts matches naive left-outer counting") {
    // include duplicate-coordinate left rows (the sf0.1 regression: two
    // rows sharing (ref,start,end) must each get the coordinate's count,
    // not double it)
    val base = randomIntervals(150, seed = 8, maxLen = 300)
    val dupes = base.limit(20)
      .withColumn("id", org.apache.spark.sql.functions.col("id") + 1000L)
    val l = base.unionByName(dupes)
    val r = randomIntervals(150, seed = 9, maxLen = 100)
    val got = RegionJoins.overlapCounts(l, r, binSize = 100L)
      .select("id", "n_overlaps").collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    val expected = naive(l, r, "left_outer", 0L)
      .groupBy(_._1.get)
      .view.mapValues(_.count(_._2.isDefined).toLong).toMap
    assert(got == expected)
  }

  test("empty sides behave") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long, Long)]
      .toDF("referenceName", "start", "end", "id")
    val l = randomIntervals(10, seed = 7, maxLen = 10)
    assert(binnedResult(l, empty, "inner", 1000L, 0L).isEmpty)
    assert(binnedResult(l, empty, "left_outer", 1000L, 0L).size == 10)
    assert(binnedResult(empty, l, "right_outer", 1000L, 0L).size == 10)
  }

  test("groupByRight is the mirror of groupByLeft") {
    val l = randomIntervals(80, seed = 10, maxLen = 200)
    val r = randomIntervals(80, seed = 11, maxLen = 200)
    val got = RegionJoins.overlapJoinGroupByRight(
        l, r, leftStructCols = Seq("id"), outer = true, binSize = 500L)
      .select(col("id"), expr("transform(overlaps, x -> x.id)").as("lids"))
      .collect()
      .map(row => row.getLong(0) -> row.getSeq[Long](1).toSet).toMap
    val expected = naive(l, r, "right_outer", 0L)
      .groupBy(_._2.get)
      .view.mapValues(_.flatMap(_._1).toSet).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"right id $k") }
  }

  test("prepared broadcast side: repeated joinAgainst, BroadcastHashJoin plan") {
    val small = randomIntervals(40, seed = 12, maxLen = 100)
    val bc = RegionJoins.prepareBroadcast(small)
    try {
      val l1 = randomIntervals(200, seed = 13, maxLen = 150)
      val l2 = randomIntervals(200, seed = 14, maxLen = 150)
      val j1 = RegionJoins.joinAgainst(l1, bc)
      assert(j1.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "prepared side must broadcast")
      val got1 = j1.select("l_id", "r_id").collect()
        .map(row => (Option(row.get(0)).map(_.asInstanceOf[Long]),
          Option(row.get(1)).map(_.asInstanceOf[Long]))).toSet
      assert(got1 == naive(l1, small, "inner", 0L))
      // second join against the SAME prepared side
      val got2 = RegionJoins.joinAgainst(l2, bc, "left_outer")
        .select("l_id", "r_id").collect()
        .map(row => (Option(row.get(0)).map(_.asInstanceOf[Long]),
          Option(row.get(1)).map(_.asInstanceOf[Long]))).toSet
      assert(got2 == naive(l2, small, "left_outer", 0L))
      // grouped-by-right against the prepared side: the STREAMED rows are
      // the group keys (reference "right"); the arrays collect only the
      // broadcast-side (small) values — the memory-bounded direction.
      val grouped = RegionJoins.joinAgainstGroupByRight(
          l1, bc, sideStructCols = Seq("id"), outer = true)
        .select(col("id"), expr("transform(overlaps, x -> x.id)").as("bcids"))
        .collect()
        .map(row => row.getLong(0) -> row.getSeq[Long](1).toSet).toMap
      val expected = naive(l1, small, "left_outer", 0L)
        .groupBy(_._1.get)
        .view.mapValues(_.flatMap(_._2).toSet).toMap
      assert(grouped.keySet == expected.keySet)
      expected.foreach { case (k, v) => assert(grouped(k) == v) }
      // the grouped plan must still probe via broadcast, not shuffle
      assert(RegionJoins.joinAgainstGroupByRight(
          l1, bc, sideStructCols = Seq("id"), outer = true)
        .queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally bc.destroy()
  }

  test("tunedBinSize: floor for short intervals, scales up for long ones") {
    // short reads (len ≤ 400): p95 well under the 10 kb floor → floor exactly
    val short1 = randomIntervals(500, seed = 7, maxLen = 400)
    val short2 = randomIntervals(500, seed = 8, maxLen = 400)
    assert(RegionJoins.tunedBinSize(short1, short2) ==
      RegionJoins.DefaultBinSize)
    // long structural variants (len ~ 100 kb-1 Mb): tuned size tracks the
    // p95 length (rounded up to a floor multiple), bounding replication ≤ ~2
    import spark.implicits._
    val rnd = new Random(11)
    val long1 = (0 until 400).map { i =>
      val start = rnd.nextLong(10000000L)
      ("chr1", start, start + 100000L + rnd.nextLong(900000L), i.toLong)
    }.toDF("referenceName", "start", "end", "id")
    val tuned = RegionJoins.tunedBinSize(long1, short2)
    assert(tuned > RegionJoins.DefaultBinSize)
    assert(tuned % RegionJoins.DefaultBinSize == 0L)
    assert(tuned <= RegionJoins.MaxAutoBinSize)
    // ... and the Auto sentinel must give EXACTLY the default-size result
    val l = randomIntervals(200, seed = 9, maxLen = 300000)
    val r = randomIntervals(150, seed = 10, maxLen = 200000)
    assert(binnedResult(l, r, "inner", RegionJoins.Auto, 0L) ==
      naive(l, r, "inner", 0L))
    assert(binnedResult(l, r, "full_outer", RegionJoins.Auto, 0L) ==
      naive(l, r, "full_outer", 0L))
  }
}
