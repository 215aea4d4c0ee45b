package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {

  private val Golden = 0x9e3779b97f4a7c15L

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def tokensOf(texts: Seq[String]): Seq[String] =
    texts.flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))

  test("countMinCells equals a driver-side replay of the same hash grid") {
    val texts = Seq(
      "spark spark spark hash join", "join join scan scan scan scan",
      "the quick brown fox", "spark scan filter filter")
    val depth = 4; val width = 64
    val cells = SketchOps.countMinCells(
      SketchOps.tokenCounts(docsDf(texts), "text"), depth, width)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

    val ref = scala.collection.mutable.Map[(Int, Int), Long]()
    tokensOf(texts).groupBy(identity).foreach { case (tok, occ) =>
      val base = DedupOps.fnv1a64(tok)
      for (i <- 0 until depth) {
        val b = java.lang.Long.remainderUnsigned(
          DedupOps.splitmix64(base + i * Golden), width).toInt
        ref((i, b)) = ref.getOrElse((i, b), 0L) + occ.size
      }
    }
    assert(cells === ref.toMap)
  }

  test("cmsHeavyHitters: estimate is always an upper bound, exact at ample width") {
    val texts = (0 until 50).map(i => s"alpha beta gamma tok$i tok$i")
    val df = docsDf(texts)
    // narrow grid -> collisions likely; bound must still hold
    val narrow = SketchOps.cmsHeavyHitters(df, "text", depth = 2, width = 8, topK = 10)
      .collect()
    narrow.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("n_est") - r.getAs[Long]("n_exact"))
    }
    // 53 distinct tokens in 2^14 buckets x 4 rows: min-over-rows is exact
    // unless all four rows collide — vanishingly unlikely and checked.
    val wide = SketchOps.cmsHeavyHitters(df, "text", depth = 4, width = 16384, topK = 10)
      .collect()
    wide.foreach(r => assert(r.getAs[Long]("overcount") === 0L))
    // top-1 is the most frequent token with the deterministic tie-break
    val top = wide.minBy(r => (-r.getAs[Long]("n_exact"), r.getAs[String]("token")))
    assert(Set("alpha", "beta", "gamma").contains(top.getAs[String]("token")))
  }

  test("hllRegisters equals a driver-side replay; summary is internally consistent") {
    val texts = (0 until 300).map(i => s"w${i % 97} w${(i * 7) % 193} common")
    val p = 10
    val regs = SketchOps.hllRegisters(
      SketchOps.tokenCounts(docsDf(texts), "text"), p)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

    val ref = scala.collection.mutable.Map[Int, Int]()
    tokensOf(texts).distinct.foreach { tok =>
      val h = DedupOps.splitmix64(DedupOps.fnv1a64(tok))
      val reg = (h >>> (64 - p)).toInt
      val w = h & 0xffffffffL
      val rho = if (w == 0L) 33
        else 33 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      ref(reg) = math.max(ref.getOrElse(reg, 0), rho)
    }
    assert(regs === ref.toMap)

    val s = SketchOps.hllSummary(docsDf(texts), "text", p).collect().head
    val exact = tokensOf(texts).distinct.size.toLong
    assert(s.getAs[Long]("n_distinct") === exact)
    assert(s.getAs[Long]("n_tokens") === tokensOf(texts).size.toLong)
    assert(s.getAs[Long]("v_zero") === 1024L - ref.size)
    val sQ = (1024L - ref.size) * (1L << 33) +
      ref.values.map(r => 1L << (33 - r)).sum
    assert(s.getAs[Long]("s_q") === sQ)
    assert(s.getAs[Long]("est_q") ===
      SketchOps.hllAlphaQ(p) * 1024 * 1024 * 8 / sQ)
  }

  test("hll estimate lands within the published error band at 5k distinct") {
    // 5000 distinct >> m=1024 registers: raw-estimator regime, std error
    // 1.04/sqrt(1024) ~ 3.25%; assert a generous 4 sigma.
    val texts = (0 until 5000).map(i => s"tok$i")
    val s = SketchOps.hllSummary(docsDf(texts), "text", p = 10).collect().head
    assert(s.getAs[Long]("n_distinct") === 5000L)
    assert(s.getAs[Long]("err_permille") <= 130L,
      s"est=${s.getAs[Long]("est_q")} err=${s.getAs[Long]("err_permille")}permille")
  }

  test("bottomKSketch equals the sorted-distinct-hash prefix per group") {
    val texts = (0 until 40).map(i => s"src${i % 3} body word$i word${i + 1} word${i + 2} tail")
    import spark.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (s"s${i % 3}", t) }.toDF("source", "text")
    val k = 10
    val got = SketchOps.bottomKSketch(df, "source", "text", shingleN = 3, k = k)
      .collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.sortBy(_.getAs[Int]("r")).map(_.getAs[Long]("h")).toSeq)
      .toMap

    val ref = texts.zipWithIndex.groupBy { case (_, i) => s"s${i % 3}" }
      .view.mapValues { docs =>
        docs.flatMap { case (t, _) => DedupOps.shingles(t, 3) }
          .map(sh => DedupOps.splitmix64(DedupOps.fnv1a64(sh)))
          .distinct.sorted.take(k).toSeq
      }.toMap
    assert(got === ref)
  }

  test("sketchOverlap with k >= union size is the exact Jaccard") {
    import spark.implicits._
    // Two tiny sources with a known overlap; k=1024 dwarfs the union, so
    // the estimator degenerates to exact |A n B| / |A u B|.
    val df = Seq(
      ("a", "one two three four five six"),
      ("b", "three four five six seven eight")).toDF("source", "text")
    val sk = SketchOps.bottomKSketch(df, "source", "text", shingleN = 3, k = 1024)
    val out = SketchOps.sketchOverlap(sk, k = 1024).collect()
    assert(out.length === 1)
    val r = out.head
    val shA = DedupOps.shingles("one two three four five six", 3).toSet
    val shB = DedupOps.shingles("three four five six seven eight", 3).toSet
    val inter = (shA & shB).size
    val union = (shA | shB).size
    assert(r.getAs[String]("grp_a") === "a")
    assert(r.getAs[String]("grp_b") === "b")
    assert(r.getAs[Long]("k_used") === union.toLong)
    assert(r.getAs[Long]("n_shared") === inter.toLong)
    assert(r.getAs[Double]("est_jaccard") === inter.toDouble / union)
  }

  test("hllSummaryByGroup: per-group rows equal per-group hllSummary") {
    import spark.implicits._
    val rows = (0 until 200).map(i =>
      (s"src${i % 3}", s"w${i % 29} x${(i * 7) % 41} common"))
    val df = rows.toDF("source", "text")
    val grouped = SketchOps.hllSummaryByGroup(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    rows.map(_._1).distinct.foreach { src =>
      val single = SketchOps.hllSummary(
        df.filter($"source" === src), "text").collect().head.toSeq
      assert(grouped(src) === single, src)
    }
  }

  test("histogramSketch equals a driver-side binning replay") {
    import spark.implicits._
    val vals = Seq(
      ("a", 0.004), ("a", 0.01), ("a", 9.99), ("a", 10.0), ("a", 499.99),
      ("a", 500.0), ("a", 730.2), ("b", -3.5), ("b", 250.004), ("b", 250.006))
    val df = vals.toDF("g", "v")
    val got = SketchOps.histogramSketch(df, "g", "v", 0L, 50000L, 50)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val ref = vals.groupBy { case (g, v) =>
      val c = math.floor(v * 100 + 0.5).toLong
      val bin = if (c < 0) -1L else if (c >= 50000) 50L else c * 50 / 50000
      (g, bin)
    }.view.mapValues(_.size.toLong).toMap
    assert(got === ref)
    // boundary sanity: 499.99 -> bin 49, 500.0 -> overflow, -3.5 -> -1
    assert(got(("a", 49L)) === 1L && got(("a", 50L)) === 2L &&
      got(("b", -1L)) === 1L)
  }

  test("histogramPercentiles: smallest bin reaching the cumulative target") {
    import spark.implicits._
    // group g: 10 values spread so p50 and p99 land in known bins
    val vals = (1 to 10).map(i => ("g", i * 10.0 - 5.0)) // 5,15,...,95
    val cells = SketchOps.histogramSketch(
      vals.toDF("g", "v"), "g", "v", 0L, 10000L, 10) // bin i-1 per value
    val got = SketchOps.histogramPercentiles(
        cells, "g", Seq(500, 900, 990), 0L, 10000L, 10)
      .collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // p50: cum reaches 5/10 at bin 4; p90 at bin 8; p99 at bin 9
    assert(got(500) === ((4L, 4000L, 10L)))
    assert(got(900) === ((8L, 8000L, 10L)))
    assert(got(990) === ((9L, 9000L, 10L)))
  }

  test("sketches are identical at any partitioning") {
    val texts = (0 until 60).map(i => s"p$i q${i % 7} r${i % 13} s t u v w")
    val df = docsDf(texts)
    val a = SketchOps.hllSummary(df, "text").collect().toSeq
    val b = SketchOps.hllSummary(df.repartition(7), "text").collect().toSeq
    assert(a === b)
    val ca = SketchOps.cmsHeavyHitters(df, "text", topK = 5)
      .collect().map(_.toSeq).toSet
    val cb = SketchOps.cmsHeavyHitters(df.repartition(5), "text", topK = 5)
      .collect().map(_.toSeq).toSet
    assert(ca === cb)
  }
}
