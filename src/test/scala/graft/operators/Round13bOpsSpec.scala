package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 second batch vs hand/driver references: KS drift, mutual
  * information, Cohen's kappa, Benford audit, simplified silhouette,
  * CUSUM changepoint. */
class Round13bOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // ksDrift
  // ------------------------------------------------------------------

  test("ksDrift: hand CDFs — max gap value, exact D, smallest-value tie") {
    import spark.implicits._
    // ref = [1,1,2,3], cur = [2,3,3,4]; grid cross-products:
    // v1 |2*4-0*4|=8, v2 |3*4-1*4|=8, v3 |4*4-3*4|=4, v4 0
    // max 8 first attained at v=1; D = 8/(4*4) = 0.5
    val rows = Seq((false, 1L), (false, 1L), (false, 2L), (false, 3L),
      (true, 2L), (true, 3L), (true, 3L), (true, 4L))
    val got = Stats.ksDrift(rows.toDF("side", "v"), "side", "v").head()
    assert(got.getLong(0) == 4L && got.getLong(1) == 4L)
    assert(got.getLong(2) == 1L, s"ks_at ${got.getLong(2)}")
    assert(got.getDouble(3) == 0.5)
  }

  test("ksDrift: identical samples score exactly 0; an empty side is " +
      "NULL, not a crash") {
    import spark.implicits._
    val same = Seq((false, 5L), (false, 7L), (true, 5L), (true, 7L))
    val s1 = Stats.ksDrift(same.toDF("side", "v"), "side", "v").head()
    assert(s1.getDouble(3) == 0.0)
    val oneSided = Seq((false, 5L), (false, 7L))
    val s2 = Stats.ksDrift(oneSided.toDF("side", "v"), "side", "v").head()
    assert(s2.getLong(0) == 2L && s2.getLong(1) == 0L && s2.isNullAt(3))
  }

  test("ksDrift: null sides and null values are excluded from both " +
      "samples") {
    import spark.implicits._
    val rows = Seq((Some(false), Some(1L)), (Some(true), Some(1L)),
      (None, Some(9L)), (Some(false), None))
    val got = Stats.ksDrift(rows.toDF("side", "v"), "side", "v").head()
    assert(got.getLong(0) == 1L && got.getLong(1) == 1L)
    assert(got.getDouble(3) == 0.0)
  }

  test("ksDrift: an unquantized high-cardinality column fails LOUDLY " +
      "(caller-quantizes contract is self-defending)") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i % 2 == 0, i))
    // same data passes with a generous bound ...
    val ok = Stats.ksFromCounts(
      Stats.ksCounts(rows.toDF("side", "v"), "side", "v")).head()
    assert(ok.getLong(0) + ok.getLong(1) == 300L)
    // ... and dies with the contract message past maxGridRows
    val e = intercept[Exception] {
      Stats.ksFromCounts(
        Stats.ksCounts(rows.toDF("side", "v"), "side", "v"),
        maxGridRows = 100L).head()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("quantize")),
      s"expected the loud contract message, got: ${msgs(e)}")
  }

  test("mutualInformationReport / cohenKappa: unbounded category " +
      "columns fail LOUDLY (bounded-grid contract is self-defending)") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (s"a$i", s"b${i % 3}"))
    val eMi = intercept[Exception] {
      Stats.mutualInformationReport(rows.toDF("a", "b"), "a", "b",
        maxCells = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(eMi).exists(m => m != null && m.contains("categorical")))
    // the guard sits on rater B (the broadcast marginal) — pass the
    // 400-distinct column as colB
    val eK = intercept[Exception] {
      Stats.cohenKappa(rows.toDF("b", "a"), "a", "b",
        maxLabels = 100L).collect()
    }
    assert(msgs(eK).exists(m => m != null && m.contains("categorical")))
  }

  // ------------------------------------------------------------------
  // mutualInformationReport
  // ------------------------------------------------------------------

  test("mutualInformationReport: independent columns score exactly 0") {
    import spark.implicits._
    // uniform 2x2 grid: every cell term ln(1*4/(2*2)) = ln 1 = 0 exactly
    val rows = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
    val got = Stats.mutualInformationReport(rows.toDF("a", "b"), "a", "b")
      .head()
    assert(got.getLong(0) == 4L && got.getLong(1) == 4L)
    assert(got.getDouble(2) == 0.0, s"mi ${got.getDouble(2)}")
    assert(got.getDouble(5) == 0.0, s"nmi ${got.getDouble(5)}")
  }

  test("mutualInformationReport: a == b makes MI = H(A) and NMI = 1 " +
      "bit-for-bit (identical quantized chains)") {
    import spark.implicits._
    val rows = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("z", "z"))
    val got = Stats.mutualInformationReport(rows.toDF("a", "b"), "a", "b")
      .head()
    assert(got.getDouble(2) == got.getDouble(3)) // mi == h_a
    assert(got.getDouble(3) == got.getDouble(4)) // h_a == h_b
    assert(got.getDouble(5) == 1.0, s"nmi ${got.getDouble(5)}")
    // H = -(1/2 ln 1/2 + 1/4 ln 1/4 + 1/4 ln 1/4) = 1.5 ln 2, quantized
    assert(math.abs(got.getDouble(3) - 1.5 * math.log(2.0)) < 1e-6)
  }

  test("mutualInformationReport: NULL categories participate as their " +
      "own category") {
    import spark.implicits._
    val rows = Seq((Some("x"), Some("u")), (None, None),
      (Some("y"), Some("v")), (None, None))
    val got = Stats.mutualInformationReport(
      rows.toDF("a", "b"), "a", "b").head()
    assert(got.getLong(0) == 4L && got.getLong(1) == 3L)
    assert(got.getDouble(5) == 1.0) // perfectly dependent incl. nulls
  }

  // ------------------------------------------------------------------
  // cohenKappa
  // ------------------------------------------------------------------

  test("cohenKappa: the textbook 2x2 example is exactly 0.4") {
    import spark.implicits._
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(10)(("yes", "no")) ++ Seq.fill(5)(("no", "yes"))
    val got = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    // po = 35/50, pe = (30*25 + 20*25)/2500 = 0.5 -> kappa = 0.4 exact
    assert(got.getLong(0) == 50L && got.getLong(1) == 35L)
    assert(got.getDouble(2) == 0.4)
  }

  test("cohenKappa: both raters constant on the same label is NULL " +
      "(chance agreement is total); null labels agree as a category") {
    import spark.implicits._
    val const = Seq(("a", "a"), ("a", "a"))
    assert(Stats.cohenKappa(const.toDF("x", "y"), "x", "y")
      .head().isNullAt(2))
    val withNull = Seq((Some("a"), Some("a")), (None, None))
    val got = Stats.cohenKappa(withNull.toDF("x", "y"), "x", "y").head()
    assert(got.getLong(1) == 2L && got.getDouble(2) == 1.0)
  }

  // ------------------------------------------------------------------
  // benfordAudit
  // ------------------------------------------------------------------

  test("benfordAudit: string-derived leading digits, skip accounting, " +
      "chi2 replays the quantized 9-term chain") {
    import spark.implicits._
    // digits: 1 (from 1), 1 (from 1000), 5 (from 555), 9 (from 9);
    // skipped: 0, -5, null
    val rows = Seq(Some(1L), Some(1000L), Some(555L), Some(9L),
      Some(0L), Some(-5L), None)
    val got = Stats.benfordAudit(
      rows.toDF("v").withColumn("g", lit("g")), "g", "v").head()
    val byName = got.schema.fieldNames.zipWithIndex.toMap
    assert(got.getLong(byName("n")) == 4L)
    assert(got.getLong(byName("n_skipped")) == 3L)
    assert(got.getLong(byName("d1")) == 2L)
    assert(got.getLong(byName("d5")) == 1L)
    assert(got.getLong(byName("d9")) == 1L)
    assert(got.getLong(byName("d2")) == 0L)
    val obs = (1 to 9).map(d => got.getLong(byName(s"d$d")).toDouble)
    val chiQ = (1 to 9).map { d =>
      val e = 4.0 * Stats.BenfordP(d - 1)
      math.floor((obs(d - 1) - e) * (obs(d - 1) - e) / e * 1e7 + 0.5).toLong
    }.sum
    assert(got.getDouble(byName("chi2")) == chiQ.toDouble / 1e7)
  }

  test("benfordAudit: a perfect Benford sample scores a tiny chi2, a " +
      "uniform-digit sample a large one") {
    import spark.implicits._
    // 'benford' group: counts proportional to log10(1+1/d) out of 1000;
    // 'uniform' group: ~111 of each digit
    val benford = (1 to 9).flatMap { d =>
      val n = math.round(Stats.BenfordP(d - 1) * 1000).toInt
      Seq.fill(n)(("benford", d.toLong * 100))
    }
    val uniform = (1 to 9).flatMap(d =>
      Seq.fill(111)(("uniform", d.toLong * 100)))
    val got = Stats.benfordAudit(
        (benford ++ uniform).toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        r.getDouble(r.schema.fieldNames.indexOf("chi2"))).toMap
    assert(got("benford") < 1.0, s"benford chi2 ${got("benford")}")
    assert(got("uniform") > 50.0, s"uniform chi2 ${got("uniform")}")
  }

  // ------------------------------------------------------------------
  // simplifiedSilhouette
  // ------------------------------------------------------------------

  test("simplifiedSilhouette: two separated clusters score the exact " +
      "quantized hand value; a mislabeled cluster goes negative") {
    import spark.implicits._
    // label 0 at (0,0),(0,2) -> centroid (0,1); label 1 at (10,0),(10,2)
    // -> centroid (10,1). Every point: a = 1 unit, b = sqrt(101) units
    // (scale cancels) -> s = 1 - 1/sqrt(101), quantized at 1e7
    val rows = Seq(
      (0, Array(0.0f, 0.0f)), (0, Array(0.0f, 2.0f)),
      (1, Array(10.0f, 0.0f)), (1, Array(10.0f, 2.0f)))
    val got = ClusteringOps.simplifiedSilhouette(
        rows.toDF("label", "embedding"), "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s = 1.0 - 1.0 / math.sqrt(101.0)
    val sq = math.floor(s * 1e7 + 0.5) / 1e7
    assert(got(0L) == sq, s"got ${got(0L)} want $sq")
    assert(got(1L) == sq)
    // plant label 2 ON label 1's centroid: its own centroid is pulled
    // to the same spot -> near 0/positive for itself, but a point of
    // label 0 moved there scores negative against its own far centroid
    val noisy = rows ++ Seq((0, Array(10.0f, 1.0f)))
    val g2 = ClusteringOps.simplifiedSilhouette(
        noisy.toDF("label", "embedding"), "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(g2(0L) < got(0L), "planted mislabel must drag label 0 down")
  }

  test("simplifiedSilhouette: singleton label sits at its own centroid " +
      "and scores 1; < 2 labels and ragged vectors fail loudly") {
    import spark.implicits._
    val rows = Seq(
      (0, Array(5.0f, 5.0f)),
      (1, Array(0.0f, 0.0f)), (1, Array(0.0f, 0.2f)))
    val got = ClusteringOps.simplifiedSilhouette(
        rows.toDF("label", "embedding"), "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(0L) == 1.0)
    val one = Seq((0, Array(1.0f))).toDF("label", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      ClusteringOps.simplifiedSilhouette(one, "label")
    }
    assert(e1.getMessage.contains(">= 2 labels"))
    val ragged = Seq((0, Array(1.0f)), (1, Array(1.0f, 2.0f)))
      .toDF("label", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      ClusteringOps.simplifiedSilhouette(ragged, "label")
    }
    assert(e2.getMessage.contains("ragged"))
  }

  // ------------------------------------------------------------------
  // cusumChangepoint
  // ------------------------------------------------------------------

  test("cusumFromBucketCounts: level shift found at the boundary, exact " +
      "integer peak and permille") {
    import spark.implicits._
    // 10,10,10 then 20,20,20: T=90, m=6; S = [30,60,90,60,30,0] -> peak
    // 90 at bucket 3 (the last low bucket), permille = 90000 div 540
    val counts = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 10L),
      ("k", 4L, 20L), ("k", 5L, 20L), ("k", 6L, 20L))
    val got = Sessionize.cusumFromBucketCounts(
      counts.toDF("key", "bucket", "n")).head()
    assert(got.getString(0) == "k")
    assert(got.getLong(1) == 6L && got.getLong(2) == 90L)
    assert(got.getLong(3) == 3L, s"cp ${got.getLong(3)}")
    assert(got.getLong(4) == 90L)
    assert(got.getLong(5) == 166L)
  }

  test("cusumFromBucketCounts: constant series scores 0 permille; ties " +
      "break to the earliest bucket; single bucket is NULL") {
    import spark.implicits._
    val flat = Seq(("f", 1L, 5L), ("f", 2L, 5L), ("f", 3L, 5L),
      ("one", 9L, 7L))
    val got = Sessionize.cusumFromBucketCounts(
        flat.toDF("key", "bucket", "n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("f").getLong(5) == 0L)
    assert(got("f").getLong(3) == 1L, "tie on |S|=0 -> earliest bucket")
    assert(got("one").isNullAt(3) && got("one").isNullAt(4) &&
      got("one").isNullAt(5))
  }

  test("cusumChangepoint end-to-end: daily buckets from timestamps, " +
      "shift day recovered") {
    import spark.implicits._
    // key "t": 1 event/day on days 0..3, 5 events/day on days 4..7
    val rows = (0 to 3).map(d => ("t", d.toLong * 86400000L)) ++
      (4 to 7).flatMap(d => (1 to 5).map(i =>
        ("t", d.toLong * 86400000L + i * 1000L)))
    val got = Sessionize.cusumChangepoint(
      rows.toDF("k", "ms").withColumn("ts", timestamp_millis(col("ms"))),
      "k", "ts", 86400000L).head()
    assert(got.getLong(1) == 8L && got.getLong(2) == 24L)
    assert(got.getLong(3) == 3L, s"cp day ${got.getLong(3)}")
  }
}
