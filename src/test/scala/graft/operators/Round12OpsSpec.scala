package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 operators vs naive driver-side references: percent-rank
  * normalization, horizon dedup, fixed-n hash sampling, padding-waste
  * audit. */
class Round12OpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // percentRankNormalize
  // ------------------------------------------------------------------

  test("percentRankNormalize: (rank-1)/(n-1) with RANK tie semantics, " +
      "0.0 for singleton groups") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L),
      ("a", 4L, 30L), ("b", 5L, 7L))
    val got = Stats.percentRankNormalize(
        rows.toDF("g", "id", "score"), "g", "score")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank"))
      .toMap
    // group a: ranks 1, 2, 2, 4 over n=4 -> pr 0, 1/3, 1/3, 1
    assert(got(1L) == 0.0)
    assert(got(2L) == 1.0 / 3.0 && got(3L) == 1.0 / 3.0)
    assert(got(4L) == 1.0)
    // singleton group
    assert(got(5L) == 0.0)
  }

  // ------------------------------------------------------------------
  // horizonDedup
  // ------------------------------------------------------------------

  test("horizonDedup: chained gap semantics — each sighting refreshes " +
      "the staleness window; exactly one fresh row per epoch") {
    import spark.implicits._
    val h = 1000L
    // key k: t=0 fresh; 800 dup (gap 800); 1600 dup (gap 800 from 800);
    // 3000 fresh (gap 1400); key m: single sighting fresh
    val rows = Seq(("k", 0L, 1L), ("k", 800L, 2L), ("k", 1600L, 3L),
      ("k", 3000L, 4L), ("m", 50L, 5L))
    val got = DedupOps.horizonDedup(
        rows.toDF("key", "ms", "id")
          .withColumn("ts", timestamp_millis(col("ms"))),
        "key", "ts", "id", horizonMs = h)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("fresh"), r.getAs[Long]("epoch"))).toMap
    assert(got(1L) == (true, 0L))
    assert(got(2L) == (false, 0L))
    assert(got(3L) == (false, 0L), "chained: within horizon of PREVIOUS")
    assert(got(4L) == (true, 1L))
    assert(got(5L) == (true, 0L))
  }

  test("horizonDedupText applies the streaming twin's normalization: " +
      "whitespace/case variants share a fingerprint") {
    import spark.implicits._
    val rows = Seq((" Hello   World ", 0L, 1L), ("hello world", 100L, 2L),
      ("other", 50L, 3L))
    val got = DedupOps.horizonDedupText(
        rows.toDF("text", "ms", "id")
          .withColumn("ts", timestamp_millis(col("ms"))),
        "text", "ts", "id", horizonMs = 1000L)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("fresh")).toMap
    assert(got(1L) && !got(2L) && got(3L))
  }

  // ------------------------------------------------------------------
  // hashSampleN
  // ------------------------------------------------------------------

  test("hashSampleN: exactly min(n, |group|) rows per group, selection " +
      "a pure function of the ids (partitioning-invariant)") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"g${i % 3}", i.toLong))
    val df = rows.toDF("g", "id")
    val got = SamplingOps.hashSampleN(df, "g", "id", n = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.groupBy(_._1).forall(_._2.size == 20))
    // driver replay of the md5 rank
    def h(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (h(r._2), r._2)).take(20)
    }.toSet
    assert(got == want)
    // repartitioning never changes the selection
    val got2 = SamplingOps.hashSampleN(df.repartition(7), "g", "id", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got2 == got)
    // n larger than the group: the whole group survives
    val tiny = Seq(("t", 1L), ("t", 2L)).toDF("g", "id")
    assert(SamplingOps.hashSampleN(tiny, "g", "id", 10).count() == 2)
  }

  // ------------------------------------------------------------------
  // paddingWasteReport
  // ------------------------------------------------------------------

  test("paddingWasteReport: smallest fitting capacity, overflow " +
      "truncates into the largest, exact integer accounting") {
    import spark.implicits._
    val lens = Seq(10L, 100L, 100L, 150L, 600L, 5000L)
    val got = TokenizerOps.paddingWasteReport(
        lens.toDF("len"), "len", Seq(128L, 512L, 1024L))
      .collect().map(r => r.getAs[Long]("capacity") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_len"),
          r.getAs[Long]("padded_units"), r.getAs[Long]("truncated_units"),
          r.getAs[Long]("waste_permille"))).toMap
    // 128: lens 10,100,100 -> padded 118+28+28=174; waste 174*1000/(128*3)
    assert(got(128L) == (3L, 210L, 174L, 0L, 174L * 1000 / (128 * 3)))
    // 512: lens 150,600? no — 600 > 512 -> 1024. only 150
    assert(got(512L) == (1L, 150L, 362L, 0L, 362L * 1000 / 512))
    // 1024: 600 (padded 424) and 5000 (truncated 3976)
    assert(got(1024L) ==
      (2L, 5600L, 424L, 3976L, (424L + 3976L) * 1000 / (1024 * 2)))
    // guards
    intercept[IllegalArgumentException] {
      TokenizerOps.paddingWasteReport(lens.toDF("len"), "len",
        Seq(512L, 128L))
    }
  }
}
