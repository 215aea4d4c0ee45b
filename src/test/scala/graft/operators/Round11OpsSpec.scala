package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-11 operators vs naive driver-side references: water-filling
  * allocation, balanced shards, modularity, inter-arrival profile,
  * winsorization audit, dyadic trailing mean. */
class Round11OpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // waterFillAllocation
  // ------------------------------------------------------------------

  /** Round-based fixed point with exact BigInt tests — the definitional
    * algorithm the closed form must reproduce. */
  private def naiveWaterFill(
      rows: Seq[(String, Long, Long)], budget: Long): Map[String, Long] = {
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      val b = BigInt(budget) -
        rows.filter(r => capped(r._1)).map(r => BigInt(r._2)).sum
      val w = rows.filterNot(r => capped(r._1)).map(r => BigInt(r._3)).sum
      val newly = rows.filterNot(r => capped(r._1))
        .filter(r => BigInt(r._2) * w <= b * BigInt(r._3)).map(_._1).toSet
      changed = newly.nonEmpty
      capped ++= newly
    }
    val b = BigInt(budget) -
      rows.filter(r => capped(r._1)).map(r => BigInt(r._2)).sum
    val w = rows.filterNot(r => capped(r._1)).map(r => BigInt(r._3)).sum
    rows.map { case (s, a, wi) =>
      s -> (if (capped(s)) a else (b * wi / w).toLong)
    }.toMap
  }

  test("waterFillAllocation equals the round-based fixed point") {
    import spark.implicits._
    val rnd = new Random(41)
    for (trial <- 0 until 8) {
      val n = 3 + rnd.nextInt(8)
      val rows = (0 until n).map(i =>
        (s"s$i", 1L + rnd.nextInt(10000).toLong, 1L + rnd.nextInt(9).toLong))
      val total = rows.map(_._2).sum
      val budget = trial match {
        case 0 => 0L
        case 1 => total + 100 // everything caps
        case _ => rnd.nextLong(total)
      }
      val got = SamplingOps.waterFillAllocation(
          rows.toDF("source", "avail", "w"), "source", "avail", "w", budget)
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("allocated"), r.getAs[Boolean]("capped"))).toMap
      val want = naiveWaterFill(rows, budget)
      rows.foreach { case (s, a, _) =>
        assert(got(s)._1 == want(s), s"trial $trial source $s: " +
          s"got ${got(s)._1} want ${want(s)} (budget $budget, rows $rows)")
        assert(got(s)._1 <= a)
        assert(got(s)._2 == (want(s) == a && got(s)._1 == a ||
          got(s)._2), "capped implies allocated == available")
      }
      assert(got.values.map(_._1).sum <= budget,
        s"allocation exceeds budget in trial $trial")
      if (budget > total) assert(got.values.forall(_._2),
        "budget beyond availability must cap every source")
    }
  }

  // ------------------------------------------------------------------
  // balancedShards
  // ------------------------------------------------------------------

  test("balancedShards matches the serpentine deal and balances mass") {
    import spark.implicits._
    val rnd = new Random(43)
    val items = (0 until 1000).map(i => (i.toLong, 1L + rnd.nextInt(5000)))
    val n = 8
    val got = ShardOps.balancedShards(
        items.toDF("doc_id", "n_chars"), "n_chars", "doc_id", n)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // driver reference: sort by (size desc, id), serpentine deal
    val want = items.sortBy { case (id, sz) => (-sz, id) }.zipWithIndex
      .map { case ((id, _), idx) =>
        val pass = idx / n; val pos = idx % n
        id -> (if (pass % 2 == 0) pos else n - 1 - pos)
      }.toMap
    assert(got == want)
    // mass balance: serpentine keeps shard totals within the largest
    // item of the ideal share
    val totals = items.groupBy(i => want(i._1)).view
      .mapValues(_.map(_._2).sum).values.toSeq
    assert(totals.max - totals.min <= items.map(_._2).max)
    // report agrees
    val rep = ShardOps.shardReport(
        items.toDF("doc_id", "n_chars"), "n_chars", "doc_id", n)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep.keySet == (0 until n).toSet)
    assert(rep.values.map(_._1).sum == items.size)
    assert(rep.values.map(_._2).sum == items.map(_._2).sum)
  }

  // ------------------------------------------------------------------
  // modularity
  // ------------------------------------------------------------------

  test("modularity: exact on hand graphs, 0 for one community, " +
      "LPA beats a random labeling on a planted partition") {
    import spark.implicits._
    // two triangles bridged by one edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (1L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "b")).toDF("id", "label")
    val r = GraphOps.modularity(edges, labels).collect().head
    assert(r.getAs[Long]("m") == 7L)
    assert(r.getAs[Long]("n_within") == 6L)
    // D_a = D_b = 7, Q = 6/7 - (49+49)/(4*49)
    val want = 6.0 / 7.0 - 98.0 / (4.0 * 49.0)
    assert(math.abs(r.getAs[Double]("q_modularity") - want) < 1e-12)
    // everything in one community -> exactly 0
    val one = GraphOps.modularity(edges,
      Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id").withColumn("label", lit("x")))
      .collect().head
    assert(one.getAs[Double]("q_modularity") == 0.0)
    // planted partition: 4 cliques of 8, sparse bridges; LPA labels must
    // score far above a parity labeling
    val clique = for {
      c <- 0 until 4; i <- 0 until 8; j <- (i + 1) until 8
    } yield (c * 8 + i.toLong, c * 8 + j.toLong)
    val bridges = Seq((0L, 8L), (8L, 16L), (16L, 24L))
    val e2 = (clique ++ bridges).toDF("src", "dst")
    val lpa = GraphOps.labelPropagation(e2, rounds = 4)
      .select(col("node").as("id"), col("lbl").as("label"))
    val qLpa = GraphOps.modularity(e2, lpa)
      .collect().head.getAs[Double]("q_modularity")
    val qParity = GraphOps.modularity(e2,
        e2.select(col("src").as("id")).unionAll(e2.select(col("dst")))
          .distinct().withColumn("label", (col("id") % 2).cast("string")))
      .collect().head.getAs[Double]("q_modularity")
    assert(qLpa > 0.5, s"LPA on planted cliques scored $qLpa")
    assert(qLpa > qParity + 0.3)
  }

  // ------------------------------------------------------------------
  // interArrivalStats
  // ------------------------------------------------------------------

  test("interArrivalStats: gaps attribute to the later event's group, " +
      "disc percentiles are exact data values") {
    import spark.implicits._
    // user 1: events at 0s/10s/40s; user 2: 5s/6s
    val ev = Seq(
      (1L, 0L, "a", 10L), (1L, 10000L, "b", 11L), (1L, 40000L, "b", 12L),
      (2L, 5000L, "b", 20L), (2L, 6000L, "b", 21L)
    ).toDF("user_id", "ms", "event_type", "event_id")
      .select(col("user_id"), expr("timestamp_millis(ms)").as("ts"),
        col("event_type"), col("event_id"))
    val got = Sessionize.interArrivalStats(
        ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("p99"))).toMap
    // gaps: b<-10000 (u1 e11), b<-30000 (u1 e12), b<-1000 (u2 e21)
    assert(got == Map("b" -> ((3L, 10000L, 30000L, 30000L))))
  }

  // ------------------------------------------------------------------
  // winsorizeReport
  // ------------------------------------------------------------------

  test("winsorizeReport: cuts are exact disc percentiles and the clamp " +
      "bookkeeping is integer-exact") {
    import spark.implicits._
    val rnd = new Random(47)
    val rows = (0 until 500).map(i =>
      ("g" + (i % 2), rnd.nextInt(100000).toLong, i.toLong))
    val got = Stats.winsorizeReport(
        rows.toDF("g", "cents", "id"), "g", "cents", "id")
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("g0", "g1")) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val lo = vs((math.ceil(0.01 * vs.size) - 1).toInt)
      val hi = vs((math.ceil(0.99 * vs.size) - 1).toInt)
      val r = got(g)
      assert(r.getAs[Long]("lo_cut") == lo)
      assert(r.getAs[Long]("hi_cut") == hi)
      assert(r.getAs[Long]("n") == vs.size)
      assert(r.getAs[Long]("n_low") == vs.count(_ < lo))
      assert(r.getAs[Long]("n_high") == vs.count(_ > hi))
      assert(r.getAs[Long]("sum_cents") == vs.sum)
      assert(r.getAs[Long]("sum_winsorized_cents") ==
        vs.map(v => math.max(lo, math.min(hi, v))).sum)
    }
  }

  // ------------------------------------------------------------------
  // dyadicTrailingMean
  // ------------------------------------------------------------------

  test("dyadicTrailingMean: dyadic weights, exact cold-start renorm") {
    import spark.implicits._
    val series = (0 until 12).map(d => ("t", d.toLong, (d * d + 3).toLong))
    val got = TimeSeriesOps.dyadicTrailingMean(
        series.toDF("g", "day", "v"), "g", "day", "v", window = 4)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("num"), r.getAs[Long]("den"),
          r.getAs[Double]("smoothed"))).toMap
    for (d <- 0 until 12) {
      val pts = (math.max(0, d - 3) to d).map(j => series(j)._3)
      // weight of the point `back` steps behind day d is 2^(3-back)
      val ref = (0 until pts.size).map { back =>
        series(d - back)._3 * (1L << (3 - back))
      }
      val den = (0 until pts.size).map(back => 1L << (3 - back)).sum
      assert(got(d)._1 == ref.sum, s"day $d num")
      assert(got(d)._2 == den, s"day $d den")
      assert(got(d)._3 == ref.sum.toDouble / den.toDouble)
    }
  }
}
