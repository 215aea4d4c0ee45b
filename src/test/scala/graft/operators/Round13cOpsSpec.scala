package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 third batch vs hand/driver references: per-group AUC,
  * Flesch readability, lag-k autocorrelation, personalized PageRank,
  * hapax stats, per-group entropy. */
class Round13cOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // aucByGroup
  // ------------------------------------------------------------------

  test("aucByGroup: perfect separation = 1, anti-separation = 0, " +
      "random interleave = 0.5, exact midrank ties") {
    import spark.implicits._
    val rows =
      // g1: all positives outscore all negatives -> AUC 1
      Seq(("g1", 10L, true), ("g1", 9L, true), ("g1", 2L, false),
        ("g1", 1L, false),
        // g2: reversed -> AUC 0
        ("g2", 1L, true), ("g2", 2L, true), ("g2", 9L, false),
        ("g2", 10L, false),
        // g3: ALL scores tied -> every comparison a coin flip -> 0.5
        ("g3", 5L, true), ("g3", 5L, false), ("g3", 5L, true),
        ("g3", 5L, false))
    val got = Stats.aucByGroup(rows.toDF("g", "s", "y"), "g", "s", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("g1") == ((2L, 2L, 1.0)))
    assert(got("g2") == ((2L, 2L, 0.0)))
    assert(got("g3") == ((2L, 2L, 0.5)))
  }

  test("aucByGroup: matches the naive pairwise count (ties = half) on " +
      "a mixed fixture; one-class groups are NULL") {
    import spark.implicits._
    val data = Seq(3L -> true, 1L -> false, 4L -> true, 1L -> true,
      5L -> false, 9L -> true, 2L -> false, 6L -> false, 5L -> true,
      3L -> false)
    val pos = data.filter(_._2).map(_._1)
    val neg = data.filterNot(_._2).map(_._1)
    val naive = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum /
      (pos.size * neg.size)
    val rows = data.map { case (s, y) => ("g", s, y) } ++
      Seq(("onecls", 7L, true), ("onecls", 8L, true))
    val got = Stats.aucByGroup(rows.toDF("g", "s", "y"), "g", "s", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g").getDouble(3) == naive,
      s"got ${got("g").getDouble(3)} want $naive")
    assert(got("onecls").isNullAt(3))
  }

  test("aucByGroup: NULL scores/labels are excluded and the counts " +
      "show it") {
    import spark.implicits._
    val rows = Seq(("g", Some(2L), Some(true)), ("g", Some(1L), Some(false)),
      ("g", None, Some(true)), ("g", Some(5L), None))
    val got = Stats.aucByGroup(rows.toDF("g", "s", "y"), "g", "s", "y")
      .head()
    assert(got.getLong(1) == 1L && got.getLong(2) == 1L)
    assert(got.getDouble(3) == 1.0)
  }

  // ------------------------------------------------------------------
  // entropyByGroup
  // ------------------------------------------------------------------

  test("entropyByGroup: constant group is exactly 0, uniform group is " +
      "the quantized ln(k), nulls count as a category") {
    import spark.implicits._
    val rows = Seq(("c", Some("x")), ("c", Some("x")), ("c", Some("x")),
      ("u", Some("a")), ("u", Some("b")), ("u", Some("c")),
      ("u", Some("d")),
      ("n", Some("a")), ("n", None))
    val got = Stats.entropyByGroup(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("c") == ((3L, 1L, 0.0)))
    // uniform over 4: H = ln 4; each of 4 cells contributes
    // floor(1 * ln(4) * 1e7 + 0.5), summed / (4 * 1e7)
    val lnq = math.floor(math.log(4.0) * 1e7 + 0.5) * 4 / (4 * 1e7)
    assert(got("u") == ((4L, 4L, lnq)))
    assert(got("n")._2 == 2L, "null is its own category")
  }

  // ------------------------------------------------------------------
  // fleschReadability
  // ------------------------------------------------------------------

  test("fleschReadability: hand counts — words, sentence runs, vowel " +
      "groups with the 1-per-word floor; empty/NULL text scores NULL") {
    import spark.implicits._
    // "the cat sat." -> 3 words, 1 sentence, syllables: the(1) cat(1)
    // sat(1) = 3; "Dr. Strange?! hmm" -> words 3, sentences 2 runs
    // (. and ?!), syllables: dr(1 floor) strange(2: a,e) hmm(1 floor)
    val rows = Seq((1L, "the cat sat."), (2L, "Dr. Strange?! hmm"),
      (3L, ""), (4L, null.asInstanceOf[String]))
    val got = TextOps.fleschReadability(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(got(1L)._1 == 3L && got(1L)._2 == 1L && got(1L)._3 == 3L)
    val f1 = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(got(1L)._4 == f1)
    assert(got(2L)._1 == 3L && got(2L)._2 == 2L && got(2L)._3 == 4L)
    assert(got(3L)._1 == 0L && got(3L)._4.isNaN)
    assert(got(4L)._1 == 0L && got(4L)._4.isNaN)
  }

  test("fleschReadability: punctuation-free text divides by the " +
      "1-sentence floor, not zero") {
    import spark.implicits._
    val got = TextOps.fleschReadability(
      Seq((1L, "four plain words here")).toDF("doc_id", "text")).head()
    assert(got.getLong(2) == 0L, "raw sentence count stays 0")
    assert(!got.isNullAt(4), "score uses max(1, sentences)")
  }

  // ------------------------------------------------------------------
  // autocorrByKey
  // ------------------------------------------------------------------

  test("autocorrByKey: a period-2 alternating series is exactly -1 at " +
      "lag 1 and +1 at lag 2; calendar holes never misalign the lag") {
    import spark.implicits._
    // volumes 1,3,1,3,... on days 0..7 for key "a": perfect alternation
    val alt = (0 to 7).flatMap { d =>
      val c = if (d % 2 == 0) 1 else 3
      (1 to c).map(i => ("a", d.toLong * 86400000L + i))
    }
    // key "h": days 0,1,3,4 (day 2 missing) with volumes 1,2,4,8 —
    // lag-1 pairs are ONLY (1,0) and (4,3); a row-offset lag would
    // wrongly pair (3,1)
    val holes = Seq(("h", 0, 1), ("h", 1, 2), ("h", 3, 4), ("h", 4, 8))
      .flatMap { case (k, d, c) =>
        (1 to c).map(i => (k, d.toLong * 86400000L + i)) }
    val df = (alt ++ holes).toDF("k", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    // replay the exact chain: pairs (x_t, x_{t-1}) for t = 1..7
    def chain(pairs: Seq[(Long, Long)]): Double = {
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
    }
    val vol = (0 to 7).map(d => if (d % 2 == 0) 1L else 3L)
    val p1 = (1 to 7).map(t => (vol(t), vol(t - 1)))
    val lag1 = TimeSeriesOps.autocorrByKey(df, "k", "ts", 86400000L, 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    assert(lag1("a") == ((7L, chain(p1))))
    assert(lag1("a")._2 < -0.99, "alternation is strongly negative")
    assert(lag1("h")._1 == 2L, "only calendar-adjacent pairs")
    val p2 = (2 to 7).map(t => (vol(t), vol(t - 2)))
    val lag2 = TimeSeriesOps.autocorrByKey(df, "k", "ts", 86400000L, 2)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(lag2("a") == chain(p2))
    assert(lag2("a") > 0.99, "period-2 series is strongly positive")
    assert(lag2("h").isNaN, "h has one lag-2 pair -> NULL")
  }

  test("autocorrByKey: constant series (zero variance) and single-pair " +
      "keys are NULL, not NaN") {
    import spark.implicits._
    val rows = Seq(("c", 0L), ("c", 86400000L), ("c", 172800000L),
      ("one", 0L), ("one", 86400000L))
    val df = rows.toDF("k", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = TimeSeriesOps.autocorrByKey(df, "k", "ts", 86400000L, 1)
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(got("c"), "constant series must be NULL")
    assert(got("one"), "single pair must be NULL")
  }

  // ------------------------------------------------------------------
  // personalizedPageRank
  // ------------------------------------------------------------------

  test("personalizedPageRank: BigInt driver replay bit-for-bit; rank " +
      "concentrates near the seed") {
    import spark.implicits._
    // path graph 1-2-3-4-5 (undirected), seed at node 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val seeds = Seq(1L)
    val got = GraphOps.personalizedPageRank(
        edges.toDF("src", "dst"), seeds.toDF("node"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver replay of the exact integer recurrence
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val scale = 1000000000L
    var rank = (1L to 5L).map(n =>
      n -> (if (seeds.contains(n)) scale else 0L)).toMap
    for (_ <- 0 until 4) {
      val msgs = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs)
        msgs(v) += rank(u) / deg(u)
      rank = (1L to 5L).map(n =>
        n -> ((if (seeds.contains(n)) 3L * scale / 20L else 0L) +
          17L * msgs(n) / 20L)).toMap
    }
    assert(got == rank, s"got $got want $rank")
    // a path graph is bipartite, so per-iteration parity makes adjacent
    // ranks non-monotone; the stable claim is that the far end has seen
    // the least mass
    assert(got(2L) > got(5L) && got(3L) > got(5L),
      "rank must be lowest at the far end of the path")
  }

  test("personalizedPageRank: a dst-only seed keeps its restart mass " +
      "and appears in the output (general directed edges)") {
    import spark.implicits._
    // directed 1->2, 1->3: node 3 never appears as src
    val got = GraphOps.personalizedPageRank(
        Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"),
        Seq(3L).toDF("node"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"universe must be src∪dst: $got")
    // 3 holds exactly the teleport mass (no inflow: 1 has rank 0), and
    // is a dangling node (contributes nothing onward)
    assert(got(3L) == 3L * 1000000000L / 20L, s"got $got")
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  // ------------------------------------------------------------------
  // hapaxStats
  // ------------------------------------------------------------------

  test("hapaxStats: exact token/type/hapax accounting on a hand corpus " +
      "with the shared termCounts tokenization") {
    import spark.implicits._
    val rows = Seq(
      ("s1", "the cat the dog"),   // tokens 4, types 3, hapax 2
      ("s1", "the bird"),          // the: 3 total; bird hapax
      ("s2", "a a a"))             // tokens 3, types 1, hapax 0
    val got = TokenizerOps.hapaxStats(rows.toDF("source", "text"),
        "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got("s1")._1 == 6L && got("s1")._2 == 4L && got("s1")._3 == 3L)
    assert(got("s1")._4 == 4.0 / 6.0 && got("s1")._5 == 3.0 / 4.0)
    assert(got("s2") == ((3L, 1L, 0L, 1.0 / 3.0, 0.0)))
  }
}
