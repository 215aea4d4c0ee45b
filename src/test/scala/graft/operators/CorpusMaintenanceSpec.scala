package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The corpus-maintenance operator family of round 10: snapshot deltas,
  * token-budget selection, per-stratum calibration, next-event examples,
  * salted skew joins, boilerplate removal. */
class CorpusMaintenanceSpec extends SparkSpec {

  test("snapshotDelta classifies added/deleted/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "alpha", "s1"), (2L, "beta", "s1"),
      (3L, "gamma", "s2")).toDF("doc_id", "text", "source")
    val nw = Seq((2L, "beta", "s1"), (3L, "GAMMA edited", "s2"),
      (4L, "delta", "s2")).toDF("doc_id", "text", "source")
    val delta = SnapshotOps.snapshotDelta(old, nw, "doc_id", "text",
      carryCols = Seq("source"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(delta == Map(
      1L -> ("s1", "deleted"), 2L -> ("s1", "unchanged"),
      3L -> ("s2", "changed"), 4L -> ("s2", "added")))
  }

  test("snapshotDelta normalization: whitespace/case edits are unchanged") {
    import spark.implicits._
    val old = Seq((1L, "Hello   world")).toDF("doc_id", "text")
    val nw = Seq((1L, "  hello WORLD ")).toDF("doc_id", "text")
    val d = SnapshotOps.snapshotDelta(old, nw, "doc_id", "text").collect()
    assert(d.map(_.getString(1)).toSeq == Seq("unchanged"))
  }

  test("snapshotDeltaReport rolls the statuses up per group") {
    import spark.implicits._
    val old = Seq((1L, "a", "s"), (2L, "b", "s")).toDF("doc_id", "text", "src")
    val nw = Seq((2L, "bb", "s"), (3L, "c", "s")).toDF("doc_id", "text", "src")
    val rep = SnapshotOps.snapshotDeltaReport(
      SnapshotOps.snapshotDelta(old, nw, "doc_id", "text", Seq("src")),
      Seq("src")).collect()
    assert(rep.length == 1)
    val r = rep.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 1L, 1L, 0L))) // added, deleted, changed, unchanged
  }

  test("budgetSelect equals the single-window cumsum, boundary excluded") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1L to 500L).map(i =>
      (i, rnd.nextInt(100), 1L + rnd.nextInt(50))).toSeq
    val df = docs.toDF("doc_id", "score", "toks").repartition(7)
    val budget = 3000L
    val got = SamplingOps.budgetSelect(df, "doc_id", "score", "toks", budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    // driver replay: global (score DESC, id ASC) prefix sums
    var cum = 0L
    val expect = docs.sortBy { case (id, sc, _) => (-sc, id) }.map {
      case (id, _, tk) => cum += tk; (id, cum, cum <= budget)
    }.sortBy(_._1)
    assert(got.toSeq == expect)
    // the selection boundary: some doc is unselected with cum > budget
    assert(expect.exists(!_._3) && expect.exists(_._3))
  }

  test("budgetSelect is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, (i * 37 % 11).toInt, i % 13 + 1))
    def run(parts: Int) = SamplingOps.budgetSelect(
      docs.toDF("doc_id", "score", "toks").repartition(parts),
      "doc_id", "score", "toks", 500L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("calibratedSelect keeps ceil(n*f) of every stratum") {
    import spark.implicits._
    val rows = (1L to 90L).map(i => (s"s${i % 3}", i, (i * 31 % 17).toInt))
    val out = SamplingOps.calibratedSelect(
      rows.toDF("src", "doc_id", "score"), "src", "doc_id", "score", 0.3)
    val kept = out.filter(col("selected")).groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("s0" -> 9L, "s1" -> 9L, "s2" -> 9L))
    // calibrated is the (r-1)/n percentile: min 0, max (n-1)/n
    val cal = out.select(min("calibrated"), max("calibrated")).head()
    assert(cal.getDouble(0) == 0.0 && cal.getDouble(1) == 29.0 / 30.0)
  }

  test("nextEventExamples: bounded '>' histories per key") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "c", 30L, 102L),
      (1L, "d", 40L, 103L), (1L, "e", 50L, 104L),
      (2L, "x", 10L, 200L))
      .toDF("user_id", "event_type", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sessionize.nextEventExamples(
      ev, "user_id", "event_type", "ts", "event_id", historyLen = 3)
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (100L, "", "a"), (101L, "a", "b"), (102L, "a>b", "c"),
      (103L, "a>b>c", "d"), (104L, "b>c>d", "e"), (200L, "", "x")))
  }

  test("nextEventExamples orders by (ts, tieBreak) within key") {
    import spark.implicits._
    val ev = Seq( // same ts: event_id breaks the tie
      (1L, "b", 10L, 2L), (1L, "a", 10L, 1L), (1L, "c", 20L, 3L))
      .toDF("user_id", "event_type", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sessionize.nextEventExamples(
      ev, "user_id", "event_type", "ts", "event_id", 5)
      .collect().map(r => (r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, ""), (2L, "a"), (3L, "a>b")))
  }

  test("saltedJoin == plain join (inner and left_outer)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1L to 300L).map(i =>
      (i, rnd.nextInt(5).toLong)).toDF("id", "k") // skewed: 5 hot keys
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched"))
      .toDF("k", "v")
    for (jt <- Seq("inner", "left_outer")) {
      val plain = left.join(right, Seq("k"), jt)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getString(2)))).sorted.toSeq
      val salted = SkewOps.saltedJoin(left, right, Seq("k"), "id",
        salts = 8, joinType = jt)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getString(2)))).sorted.toSeq
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoin with NULL salt keys still equals the plain join") {
    import spark.implicits._
    // NULL id would hash to a NULL salt; the coalesce-to-0 guard must
    // keep those rows joinable exactly like the plain join
    val left = Seq((Some(1L), 1L), (None, 1L), (None, 2L), (Some(4L), 9L))
      .toDF("id", "k")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        Option(r.getString(2))))
      .sorted.toSeq
    for (jt <- Seq("inner", "left_outer")) {
      val plain = canon(left.join(right, Seq("k"), jt))
      val salted = canon(SkewOps.saltedJoin(left, right, Seq("k"), "id",
        salts = 4, joinType = jt))
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoin actually spreads a hot key across salts") {
    import spark.implicits._
    val left = (1L to 64L).map(i => (i, 1L)).toDF("id", "k")
    val right = Seq((1L, "x")).toDF("k", "v")
    // count distinct salt values the hot key lands on (reconstruct the salt)
    val salts = left.withColumn("s",
      pmod(graft.functions.GraftFunctions.fnv1a64(col("id").cast("string")),
        lit(8L)))
      .select(countDistinct("s")).head().getLong(0)
    assert(salts >= 6, s"hot key concentrated: only $salts of 8 salts used")
    assert(SkewOps.saltedJoin(left, right, Seq("k"), "id", 8).count() == 64L)
  }

  test("removeBoilerplate strips same-source template paragraphs only") {
    import spark.implicits._
    // s1 has 3 docs sharing 'FOOT'; s2 has 2 docs sharing it (< minDocs);
    // bodies are unique everywhere
    def doc(id: Long, src: String) =
      (id, src, s"FOOT\n\nbody $id")
    val docs = Seq(doc(1, "s1"), doc(2, "s1"), doc(3, "s1"),
      doc(4, "s2"), doc(5, "s2")).toDF("doc_id", "source", "text")
    val out = DedupOps.removeBoilerplate(docs, "doc_id", "text", "source",
      minDocs = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    for (id <- 1L to 3L)
      assert(out(id) == ((s"body $id", 1L, 4L)), s"doc $id")
    for (id <- 4L to 5L) // below threshold in s2: kept intact
      assert(out(id) == ((s"FOOT\n\nbody $id", 0L, 0L)), s"doc $id")
  }

  test("removeBoilerplate byte-preserves documents with nothing removed") {
    import spark.implicits._
    // doc 4 is untouched but contains a whitespace-only paragraph and
    // trailing separators that reassembly would normalize away
    val weird = "unique body\n\n   \n\nanother para\n\n"
    val docs = Seq((1L, "s", "X\n\na 1"), (2L, "s", "X\n\na 2"),
      (3L, "s", "X\n\na 3"), (4L, "t", weird))
      .toDF("doc_id", "source", "text")
    val out = DedupOps.removeBoilerplate(docs, "doc_id", "text", "source", 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(4L) == ((weird, 0L)), "untouched doc must be byte-identical")
    assert(out(1L) == (("a 1", 1L)))
  }

  test("removeBoilerplate: fully-boilerplate doc becomes empty with counts") {
    import spark.implicits._
    val docs = Seq((1L, "s", "X\n\nY"), (2L, "s", "X\n\nY"),
      (3L, "s", "X\n\nY")).toDF("doc_id", "source", "text")
    val out = DedupOps.removeBoilerplate(docs, "doc_id", "text", "source", 3)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.forall(_ == (("", 2L, 2L))))
  }

  test("globalNtile matches a sequential ANSI NTILE replay (ties included)") {
    import spark.implicits._
    // 0..96 with heavy value ties; tieBreak=id makes the order total
    val rows = (0 until 97).map(i => (i.toLong, (i % 7).toLong))
    val df = rows.toDF("id", "v").repartition(8)
    for (n <- Seq(1, 4, 10)) {
      val got = Quantiles.globalNtile(df, "v", "id", n)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      // independent replay: fill buckets sequentially with ANSI sizes
      val sorted = rows.sortBy(t => (t._2, t._1)).map(_._1)
      val (q, r) = (sorted.size / n, sorted.size % n)
      val sizes = Seq.fill(r)(q + 1) ++ Seq.fill(n - r)(q)
      val want = sizes.zipWithIndex.flatMap { case (sz, b) =>
        Seq.fill(sz)(b + 1) }
      assert(got == sorted.zip(want).toMap, s"n=$n")
    }
  }

  test("globalNtile with fewer rows than buckets: one row per bucket") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L)).toDF("id", "v")
    val got = Quantiles.globalNtile(df, "v", "id", n = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(2L -> 1, 1L -> 2, 3L -> 3))
  }

  test("calibrationCurve: a perfectly predictive score is monotone 0 to 1") {
    import spark.implicits._
    // score == outcome signal: top half positive, bottom half negative
    val df = (1L to 100L).map(i => (i, i.toDouble, i > 50))
      .toDF("id", "score", "pos")
    val out = Quantiles.calibrationCurve(df, "score", "pos", "id", n = 4)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out == Map(
      1 -> ((25L, 0L, 0.0)), 2 -> ((25L, 0L, 0.0)),
      3 -> ((25L, 25L, 1.0)), 4 -> ((25L, 25L, 1.0))))
  }

  test("keySkewReport: counts, shares, totals, deterministic top-k order") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++
      Seq("a", "b", "c")).toDF("k")
    val out = SkewOps.keySkewReport(df, "k", k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("hot", 6L, 6.0 / 12.0, 12L, 5L),
      ("warm", 3L, 3.0 / 12.0, 12L, 5L)))
  }
}
