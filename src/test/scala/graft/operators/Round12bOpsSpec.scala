package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Second round-12 operator batch vs hand/driver references: Neyman
  * allocation, exact source-overlap matrix, OOV rate, filter waterfall,
  * integer HITS, RFM scoring. */
class Round12bOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // neymanAllocation
  // ------------------------------------------------------------------

  test("neymanAllocation: weight = sqrt(N*sum(x^2) - sum(x)^2), " +
      "population cap binds, zero-variance stratum gets nothing") {
    import spark.implicits._
    // a: values {0,10} -> SS = 2*100 - 100 = 100 -> wq = 10e6
    // b: values {5,5}  -> SS = 0 -> wq = 0
    val df = Seq(("a", 0L), ("a", 10L), ("b", 5L), ("b", 5L))
      .toDF("s", "v")
    val got = SamplingOps.neymanAllocation(df, "s", "v", budget = 4L)
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("weight_q"), r.getAs[Long]("alloc"))).toMap
    assert(got("a") == (10000000L, 2L), "quota 4 capped at population 2")
    assert(got("b") == (0L, 0L), "zero-variance stratum draws nothing")
  }

  test("neymanAllocation: all-constant corpus degrades to proportional " +
      "largest-remainder on sizes") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L), ("b", 7L))
      .toDF("s", "v")
    val got = SamplingOps.neymanAllocation(df, "s", "v", budget = 3L)
      .collect().map(r => r.getAs[String]("stratum") ->
        r.getAs[Long]("alloc")).toMap
    // weights 2 and 3 of W=5: bases 3*2div5=1, 3*3div5=1; the one
    // leftover seat goes to b (remainder 4 > 1)
    assert(got == Map("a" -> 1L, "b" -> 2L))
  }

  test("neymanAllocation: budget exhausted exactly when caps don't bind") {
    import spark.implicits._
    // three strata, plenty of rows each, distinct spreads
    val rows = (0 until 30).map(i => ("a", (i % 7).toLong * 10)) ++
      (0 until 30).map(i => ("b", (i % 3).toLong)) ++
      (0 until 30).map(i => ("c", (i % 11).toLong * 25))
    val got = SamplingOps.neymanAllocation(
        rows.toDF("s", "v"), "s", "v", budget = 20L)
      .collect()
    assert(got.map(_.getAs[Long]("alloc")).sum == 20L)
    // the widest-spread stratum (c) must out-draw the narrowest (b)
    val m = got.map(r =>
      r.getAs[String]("stratum") -> r.getAs[Long]("alloc")).toMap
    assert(m("c") > m("b"))
  }

  // ------------------------------------------------------------------
  // sourceOverlapExact
  // ------------------------------------------------------------------

  test("sourceOverlapExact: exact shared counts + Jaccard permille, " +
      "zero-overlap pairs present in the grid") {
    import spark.implicits._
    val docs = Seq(("s1", "x"), ("s1", "y"), ("s2", "y"), ("s2", "z"),
      ("s2", "Y "), // normalizes to y — distinct-fp dedup inside s2
      ("s3", "w")).toDF("source", "text")
    val got = CorpusCompareOps.sourceOverlapExact(docs, "text", "source")
      .collect().map(r =>
        (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Long]("n_shared"), r.getAs[Long]("jaccard_permille")))
      .toMap
    assert(got.size == 3, "complete pair grid over 3 sources")
    assert(got(("s1", "s2")) == (2L, 2L, 1L, 333L)) // 1000 div 3
    assert(got(("s1", "s3")) == (2L, 1L, 0L, 0L))
    assert(got(("s2", "s3")) == (2L, 1L, 0L, 0L))
  }

  // ------------------------------------------------------------------
  // oovRate
  // ------------------------------------------------------------------

  test("oovRate: occurrence-weighted OOV mass against a supplied vocab") {
    import spark.implicits._
    val docs = Seq(("s1", "a A b"), ("s2", "a c c C")).toDF("source", "text")
    val vocab = Seq("a", "b", "a").toDF("tok") // dup entries deduped
    val got = TokenizerOps.oovRate(docs, "text", "source", vocab, "tok")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_tokens"),
          r.getAs[Long]("oov_permille"))).toMap
    assert(got("s1") == (3L, 0L, 0L))
    assert(got("s2") == (4L, 3L, 750L))
  }

  // ------------------------------------------------------------------
  // filterWaterfall
  // ------------------------------------------------------------------

  test("filterWaterfall: isolation vs first-fail attribution vs " +
      "survivors; NULL predicate is a failure") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (50L, "en"),   // fails r1 only -> attributed to r1
      (500L, "en"),  // fails r2 only -> attributed to r2
      (50L, "de"),   // fails r1 and r3 -> attributed to r1
      (200L, "de"),  // fails r3 only -> attributed to r3
      (null, "en"),  // NULL length: fails r1 AND r2 (unknown != pass)
      (200L, "en"))  // survives all
      .toDF("len", "lang")
    val rules = Seq(
      "min" -> (col("len") >= 100),
      "max" -> (col("len") <= 400),
      "en" -> (col("lang") === "en"))
    val got = ProfileOps.filterWaterfall(df, rules)
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Int]("rule_order"), r.getAs[Long]("n_fail"),
          r.getAs[Long]("n_first_fail"), r.getAs[Long]("n_surviving")))
      .toMap
    assert(got("min") == (1, 3L, 3L, 3L))
    assert(got("max") == (2, 2L, 1L, 2L))
    assert(got("en") == (3, 2L, 1L, 1L))
    // marginal head-counts account for every removed row
    assert(3L + 1L + 1L == df.count() - 1)
  }

  test("filterWaterfall: n_surviving is non-increasing and total-" +
      "consistent on the sf0.001 documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = ProfileOps.filterWaterfall(docs, Seq(
      "min_len" -> (col("n_chars") >= 100),
      "max_len" -> (col("n_chars") <= 400),
      "english" -> (col("lang") === "en")))
      .orderBy("rule_order").collect()
    val surv = out.map(_.getAs[Long]("n_surviving"))
    assert(surv.sliding(2).forall(p => p(0) >= p(1)))
    assert(out.map(_.getAs[Long]("n_first_fail")).sum ==
      docs.count() - surv.last)
  }

  // ------------------------------------------------------------------
  // hits
  // ------------------------------------------------------------------

  /** Driver replay of the exact integer recurrence. */
  private def hitsReplay(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val e = edges.distinct
    val mass = BigInt("1000000000000")
    var h = e.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 0 until iters) {
      val araw = e.groupBy(_._2).map { case (n, es) =>
        n -> es.map(x => h(x._1)).sum }
      val at = araw.values.sum
      a = araw.map { case (n, r) => n -> (r * mass / at) }
      val hraw = e.groupBy(_._1).map { case (n, es) =>
        n -> es.map(x => a(x._2)).sum }
      val ht = hraw.values.sum
      h = hraw.map { case (n, r) => n -> (r * mass / ht) }
    }
    (a.map { case (k, v) => k -> v.toLong },
      h.map { case (k, v) => k -> v.toLong })
  }

  test("hits: matches the BigInt replay of the integer recurrence " +
      "bit-for-bit on a bipartite graph") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L),
      (3L, 11L), (3L, 12L), (1L, 10L)) // dup edge deduped
    val (expA, expH) = hitsReplay(edges, 3)
    val got = GraphOps.hits(edges.toDF("src", "dst"), iters = 3)
      .collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("node")) ->
        r.getAs[Long]("score_q")).toMap
    expA.foreach { case (n, s) => assert(got(("auth", n)) == s, s"auth $n") }
    expH.foreach { case (n, s) => assert(got(("hub", n)) == s, s"hub $n") }
    // 11 is the consensus authority; 10/12 split the rest
    assert(expA(11L) > expA(10L) && expA(11L) > expA(12L))
  }

  test("hitsTopK: per-side cut with (score desc, node) tie-break") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L))
    val got = GraphOps.hitsTopK(edges.toDF("src", "dst"), iters = 2, k = 1)
      .collect().map(r => r.getAs[String]("side") ->
        r.getAs[Long]("node")).toMap
    assert(got("auth") == 11L)
    // hubs 1 and 2 are symmetric (same score) -> smallest node wins
    assert(got("hub") == 1L)
  }

  // ------------------------------------------------------------------
  // rfmScores
  // ------------------------------------------------------------------

  test("rfmScores: exact per-key aggregates + ANSI ntile tiers + " +
      "composed segment label") {
    import spark.implicits._
    // 4 users, tiers=2: ntile(2) over 4 rows -> buckets 1,1,2,2
    val rows = Seq(
      (1L, 1000L, 5.0), (1L, 5000L, 5.0),    // 2 events, 1000c, last 5s
      (2L, 9000L, 1.0),                       // 1 event, 100c, last 9s
      (3L, 2000L, 50.004), (3L, 3000L, 0.0), (3L, 4000L, 0.0),
      (4L, 8000L, 2.0))
    val df = rows.toDF("u", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sessionize.rfmScores(df, "u", "ts", "value", tiers = 2)
      .collect().map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("last_ts_ms"), r.getAs[Long]("n_events"),
          r.getAs[Long]("monetary_cents"), r.getAs[Int]("r_score"),
          r.getAs[Int]("f_score"), r.getAs[Int]("m_score"),
          r.getAs[Int]("rfm"))).toMap
    // last_ts: u1=5000 u2=9000 u3=4000 u4=8000 -> asc u3,u1,u4,u2
    //   r: u3=1 u1=1 u4=2 u2=2
    // n_events: u2=1 u4=1 u1=2 u3=3 (ties by key) -> f: u2=1 u4=1 u1=2 u3=2
    // cents: u1=1000 u2=100 u3=5000 (floor(50.004*100+0.5)=5000) u4=200
    //   asc u2,u4,u1,u3 -> m: u2=1 u4=1 u1=2 u3=2
    assert(got(1L) == (5000L, 2L, 1000L, 1, 2, 2, 122))
    assert(got(2L) == (9000L, 1L, 100L, 2, 1, 1, 211))
    assert(got(3L) == (4000L, 3L, 5000L, 1, 2, 2, 122))
    assert(got(4L) == (8000L, 1L, 200L, 2, 1, 1, 211))
  }

  // ------------------------------------------------------------------
  // nearestCentroidEval
  // ------------------------------------------------------------------

  test("nearestCentroidEval: separable labels recover the diagonal; a " +
      "mislabeled point lands off-diagonal; ties to smallest label") {
    import spark.implicits._
    // label 0 clusters near (1,0), label 1 near (0,1); vec 5 carries
    // label 1 but sits at (1,0) -> predicted 0
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.1f, 0.9f)),
      (5L, 1, Array(1.0f, 0.0f)))
    val got = ClusteringOps.nearestCentroidEval(
        rows.toDF("vec_id", "label", "embedding"), "label")
      .collect().map(r => (r.getAs[Long]("label"),
        r.getAs[Long]("predicted")) -> r.getAs[Long]("n")).toMap
    assert(got((0L, 0L)) == 2L)
    assert(got((1L, 1L)) == 2L)
    assert(got((1L, 0L)) == 1L, "planted mislabel must land off-diagonal")
    // equidistant fixture: a point exactly between both centroids takes
    // the SMALLEST label (strict < keeps the first minimum)
    val tied = Seq(
      (1L, 3, Array(1.0f, 0.0f)), (2L, 7, Array(0.0f, 1.0f)),
      (3L, 7, Array(0.5f, 0.5f)), (4L, 3, Array(0.5f, 0.5f)))
    // centroids: label3 = (.75,.25), label7 = (.25,.75) -> (.5,.5) tie
    val t2 = ClusteringOps.nearestCentroidEval(
        tied.toDF("vec_id", "label", "embedding"), "label")
      .collect().map(r => (r.getAs[Long]("label"),
        r.getAs[Long]("predicted")) -> r.getAs[Long]("n")).toMap
    assert(t2((7L, 3L)) == 1L && t2((3L, 3L)) == 2L,
      s"equidistant points must take the smallest label: $t2")
  }

  test("nearestCentroidEval: loud failures on string labels and empty " +
      "corpora; null-labeled rows excluded from centroids and output") {
    import spark.implicits._
    val strLabels = Seq((1L, "en", Array(1.0f)), (2L, "de", Array(0.0f)))
      .toDF("vec_id", "label", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      ClusteringOps.nearestCentroidEval(strLabels, "label")
    }
    assert(e1.getMessage.contains("integral label"))
    val empty = Seq.empty[(Long, Int, Array[Float])]
      .toDF("vec_id", "label", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      ClusteringOps.nearestCentroidEval(empty, "label")
    }
    assert(e2.getMessage.contains("no labeled vectors"))
    val withNulls = Seq(
      (1L, java.lang.Integer.valueOf(0), Array(1.0f, 0.0f)),
      (2L, java.lang.Integer.valueOf(1), Array(0.0f, 1.0f)),
      (3L, null.asInstanceOf[java.lang.Integer], Array(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val got = ClusteringOps.nearestCentroidEval(withNulls, "label")
      .collect()
    assert(got.map(_.getAs[Long]("n")).sum == 2L,
      "the null-labeled row must not be scored")
  }

  // ------------------------------------------------------------------
  // burstActivityReport
  // ------------------------------------------------------------------

  test("burstActivityReport: fixed-bucket max, threshold flag") {
    import spark.implicits._
    // u1: 3 events in one minute bucket + 1 elsewhere; u2: spread out
    val rows = Seq((1L, 0L), (1L, 10000L), (1L, 50000L), (1L, 70000L),
      (2L, 0L), (2L, 65000L), (2L, 130000L))
    val df = rows.toDF("u", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sessionize.burstActivityReport(df, "u", "ts",
        bucketMs = 60000L, burstThreshold = 3L)
      .collect().map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("max_per_bucket"),
          r.getAs[Boolean]("is_burst"))).toMap
    assert(got(1L) == (4L, 3L, true))
    assert(got(2L) == (3L, 1L, false))
  }

  test("ts column names needing backticks work through normalizeTs and " +
      "the event operators (spliced names are quoted)") {
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 10000L), (2L, 950000L))
      .toDF("u", "event ms") // space in the raw column
      .withColumn("my ts", timestamp_millis(col("`event ms`")))
      .drop("event ms")
    val norm = graft.core.Tables.normalizeTs(df, "my ts")
    assert(norm.schema("my ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = Sessionize.burstActivityReport(norm, "u", "my ts",
        bucketMs = 60000L, burstThreshold = 2L)
      .collect().map(r => r.getAs[Long]("key") ->
        r.getAs[Long]("max_per_bucket")).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  // ------------------------------------------------------------------
  // fdViolations
  // ------------------------------------------------------------------

  test("fdViolations: only multi-valued determinants, worst-first order") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L),
      ("c", 1L), ("c", 2L), ("c", 3L), ("c", 3L)).toDF("det0", "dep0")
    val got = ProfileOps.fdViolations(df, "det0", "dep0", k = 10)
      .collect().map(r => (r.getAs[String]("det"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct_dep")))
    assert(got.toSeq == Seq(("c", 4L, 3L), ("b", 2L, 2L)),
      s"'a' holds the FD and must not appear: ${got.toSeq}")
  }

  // ------------------------------------------------------------------
  // profileDrift
  // ------------------------------------------------------------------

  test("profileDrift: added/removed/common status, exact permille " +
      "null-rate delta, NULL metrics for absent sides") {
    import spark.implicits._
    val a = Seq(("x", "en"), ("y", "en"), ("z", "de"), ("w", "de"))
      .toDF("text", "lang")
    val b = Seq(("x", null: String, 1L), ("y", "en", 2L),
      ("q", "de", 3L), ("r", "de", 4L))
      .toDF("text", "lang", "vers")
    val got = ProfileOps.profileDrift(
        a, Seq("text", "lang"), b, Seq("text", "lang", "vers"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got("vers").getAs[String]("status") == "added")
    assert(got("vers").isNullAt(got("vers").fieldIndex("n_rows_a")))
    assert(got("vers").isNullAt(
      got("vers").fieldIndex("null_delta_permille")))
    val lang = got("lang")
    assert(lang.getAs[String]("status") == "common")
    // null rate: 0/4 -> 1/4 = +250 permille
    assert(lang.getAs[Long]("null_delta_permille") == 250L)
    // text cardinality unchanged (4 distinct each side)
    assert(got("text").getAs[Long]("distinct_delta") == 0L)
  }

  test("profileDrift: removed column reports the a-side metrics only") {
    import spark.implicits._
    val a = Seq(("x", "s1"), ("y", "s2")).toDF("text", "source")
    val b = Seq(Tuple1("x"), Tuple1("y")).toDF("text")
    val row = ProfileOps.profileDrift(
        a, Seq("text", "source"), b, Seq("text"))
      .filter(col("col_name") === "source").collect().head
    assert(row.getAs[String]("status") == "removed")
    assert(row.getAs[Long]("n_distinct_a") == 2L)
    assert(row.isNullAt(row.fieldIndex("n_rows_b")))
  }
}
