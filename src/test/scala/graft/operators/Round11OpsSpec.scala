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
  // assortativity
  // ------------------------------------------------------------------

  test("assortativity: -1 on a star, NULL on a regular graph, matches " +
      "naive Pearson on a random graph") {
    import spark.implicits._
    // P3 path = K1,2 star: perfectly disassortative
    val star = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = GraphOps.assortativity(star).collect().head
    assert(r1.getAs[Long]("m") == 2L)
    assert(r1.getAs[Double]("r_assortativity") == -1.0)
    // K3 is 2-regular: zero degree variance -> NULL
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(GraphOps.assortativity(k3).collect().head.isNullAt(1))
    // random graph vs naive symmetric Pearson over edge-degree pairs
    val rnd = new Random(53)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    val xs = und.flatMap(e => Seq(deg(e._1), deg(e._2)))
    val ys = und.flatMap(e => Seq(deg(e._2), deg(e._1)))
    val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val vy = ys.map(y => (y - my) * (y - my)).sum
    val want = cov / math.sqrt(vx * vy)
    val got = GraphOps.assortativity(edges.toDF("src", "dst"))
      .collect().head.getAs[Double]("r_assortativity")
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }

  // ------------------------------------------------------------------
  // firstTouchAttribution
  // ------------------------------------------------------------------

  test("firstTouchAttribution: earliest touch within the trailing window, " +
      "inclusive bounds, NULL when none") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 0L, 10L), (1L, "view", 5000L, 11L),
      (1L, "purchase", 10000L, 12L), (1L, "purchase", 20000L, 13L),
      (2L, "view", 7000L, 20L), (2L, "purchase", 7000L, 21L)
    ).toDF("user_id", "event_type", "ms", "event_id")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_millis(ms)").as("ts"), col("event_id"))
    val got = Sessionize.firstTouchAttribution(
        ev, "user_id", "event_type", "ts", "event_id",
        "view", "purchase", windowMs = 8000L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("first_touch_ms")),
          Option(r.getAs[Any]("gap_ms")))).toMap
    // purchase@10s, window [2s,10s]: view@0 excluded, view@5s wins
    assert(got(12L) == ((Some(5000L), Some(5000L))))
    // purchase@20s, window [12s,20s]: no view
    assert(got(13L) == ((None, None)))
    // same-instant touch counts (inclusive upper bound)
    assert(got(21L) == ((Some(7000L), Some(0L))))
  }

  // ------------------------------------------------------------------
  // mergeClusters
  // ------------------------------------------------------------------

  test("mergeClusters: labels + new pairs == from-scratch clustering") {
    import spark.implicits._
    val rnd = new Random(59)
    val star = (0 until 300).map(i =>
      (i.toLong, (i - i % 5).toLong)).filter(p => p._1 != p._2)
    val chain = (0 until 300).filter(_ % 50 < 8)
      .map(i => (i.toLong, (i + 1).toLong))
    val old = DedupOps.clusterDuplicates(star.toDF("id_a", "id_b"))
    val merged = DedupOps.mergeClusters(old, chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = DedupOps.clusterDuplicates(
        (star ++ chain).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == scratch)
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
  // cappedTopK
  // ------------------------------------------------------------------

  test("cappedTopK: global order under a per-group cap, exact tie order") {
    import spark.implicits._
    // group g0 has the 10 best scores; cap 3 forces diversity
    val rows = (0 until 40).map { i =>
      val g = if (i < 10) "g0" else "g" + (i % 4 + 1)
      (i.toLong, g, 1000L - i)
    }
    val got = SamplingOps.cappedTopK(
        rows.toDF("id", "src", "score"), "score", "src", "id",
        k = 8, perGroupCap = 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    // driver reference: per-group top-3 by (score desc, id), then global
    val want = rows.groupBy(_._2).values.flatMap(
        _.sortBy(r => (-r._3, r._1)).take(3))
      .toSeq.sortBy(r => (-r._3, r._1)).take(8).map(_._1)
    assert(got == want)
    assert(got.count(i => rows(i.toInt)._2 == "g0") == 3)
  }

  // ------------------------------------------------------------------
  // madOutliers
  // ------------------------------------------------------------------

  test("madOutliers: exact integer MAD rule, robust to a wild value, " +
      "zero-MAD group flags every deviation") {
    import spark.implicits._
    // g0: tight cluster + one wild point that must NOT drag the threshold
    val g0 = Seq(100L, 101L, 102L, 103L, 104L, 1000000L)
    // g1: constant-majority -> mad 0 -> any deviation flags
    val g1 = Seq(5L, 5L, 5L, 5L, 9L)
    val rows = g0.zipWithIndex.map { case (v, i) => ("g0", v, i.toLong) } ++
      g1.zipWithIndex.map { case (v, i) => ("g1", v, 100L + i) }
    val got = Stats.madOutliers(
        rows.toDF("g", "cents", "id"), "g", "cents", "id",
        kPermille = 3500L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("cents")) ->
        (r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Boolean]("is_out"))).toMap
    // g0: sorted 100..104,1e6; disc median rank ceil(0.5*6)=3 -> 102;
    // devs sorted 0,1,1,2,2,999898 -> mad = 1
    assert(got(("g0", 102L)) == ((102L, 1L, false)))
    assert(got(("g0", 104L)) == ((102L, 1L, false))) // dev 2*1000 <= 3500
    assert(got(("g0", 100L)) == ((102L, 1L, false))) // dev 2
    assert(got(("g0", 1000000L))._3, "wild value must flag")
    // robustness: with a MEAN/zscore rule the wild point drags the
    // threshold so nothing flags; MAD still flags it (asserted above)
    // g1: med 5, mad 0 -> only the deviating 9 flags
    assert(got(("g1", 5L)) == ((5L, 0L, false)))
    assert(got(("g1", 9L)) == ((5L, 0L, true)))
  }

  // ------------------------------------------------------------------
  // psiReport
  // ------------------------------------------------------------------

  test("psiReport: identical distributions score 0, shifted score high, " +
      "zero-count buckets stay finite") {
    import spark.implicits._
    // identical ref/cur: every bucket p == q exactly -> psi_q == 0
    val same = (0 until 400).map(i => (i % 2 == 1, (i / 2) % 5))
    val r1 = CorpusCompareOps.psiReport(
        same.toDF("is_cur", "b"), "is_cur", "b")
      .collect()
    assert(r1.length == 5 && r1.forall(_.getAs[Long]("psi_q") == 0L))
    // disjoint supports: strong drift, finite everywhere (smoothing),
    // every bucket contributes positively
    val shifted = (0 until 200).map(i => (false, i % 3)) ++
      (0 until 200).map(i => (true, 10 + i % 3))
    val r2 = CorpusCompareOps.psiReport(
        shifted.toDF("is_cur", "b"), "is_cur", "b")
      .collect().map(r => r.getAs[Int]("b") -> r.getAs[Long]("psi_q")).toMap
    assert(r2.size == 6)
    assert(r2.values.forall(v => v > 0))
    val total = r2.values.sum / 1e7
    assert(total > 0.25, s"disjoint supports must flag major drift: $total")
    // driver replay of the exact chain for bucket 0 (67 ref rows: i%3==0
    // over 0..199; +1 smoothing, denominators total+nb = 206)
    val p = (67.0 + 1) / 206.0; val q = 1.0 / 206.0
    val want = math.floor((p - q) * math.log(p / q) * 1e7 + 0.5).toLong
    assert(r2(0) == want)
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
