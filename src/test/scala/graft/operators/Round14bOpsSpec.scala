package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 batch B vs hand/driver references: Fleiss' kappa,
  * deterministic Poisson-bootstrap CI, weekly seasonality profile. */
class Round14bOpsSpec extends SparkSpec {

  test("fleissKappa: hand chain, perfect agreement = 1, constant " +
      "labels NULL, single rater NULL, ragged counts loud") {
    import spark.implicits._
    // 2 items x 2 raters: item1 (A,A), item2 (A,B)
    // S2 = 6, Nn = 4, T2 = 10 -> kappa = -2/6
    val r1 = Stats.fleissKappa(
      Seq((1, "A"), (1, "A"), (2, "A"), (2, "B")).toDF("i", "l"),
      "i", "l").head()
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 2L &&
      r1.getLong(2) == 2L)
    assert(r1.getDouble(3) == 0.5 && r1.getDouble(4) == 0.625)
    assert(math.abs(r1.getDouble(5) - (-1.0 / 3.0)) < 1e-15)
    // perfect agreement, labels varying across items -> kappa = 1
    val r2 = Stats.fleissKappa(
      Seq((1, "A"), (1, "A"), (1, "A"), (2, "B"), (2, "B"), (2, "B"))
        .toDF("i", "l"), "i", "l").head()
    assert(r2.getDouble(5) == 1.0, r2.toString)
    // all raters constant on ONE label: p_e = 1 -> NULL
    val r3 = Stats.fleissKappa(
      Seq((1, "A"), (1, "A"), (2, "A"), (2, "A")).toDF("i", "l"),
      "i", "l").head()
    assert(r3.isNullAt(5), "total chance agreement must be NULL")
    // single rater per item: p_bar/kappa undefined
    val r4 = Stats.fleissKappa(
      Seq((1, "A"), (2, "B")).toDF("i", "l"), "i", "l").head()
    assert(r4.isNullAt(3) && r4.isNullAt(5))
    // ragged rating counts fail loudly
    val e = intercept[Exception] {
      Stats.fleissKappa(
        Seq((1, "A"), (1, "B"), (2, "A")).toDF("i", "l"), "i", "l")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("constant rating")))
  }

  test("bootstrapCi: bit-for-bit driver replay of every resample, " +
      "deterministic across runs, constant group degenerate") {
    import spark.implicits._
    val rows = Seq(
      ("a", 100L, "r1"), ("a", 200L, "r2"), ("a", 400L, "r3"),
      ("a", 800L, "r4"), ("a", 1600L, "r5"),
      ("c", 7L, "c1"), ("c", 7L, "c2"), ("c", 7L, "c3"))
    val b = 8
    val got = SamplingOps.bootstrapCi(rows.toDF("g", "v", "id"),
        "g", "v", "id", b = b).collect()
      .map(r => r.getString(0) -> r).toMap

    // driver replay: identical hash -> weight -> mean chain
    def u(id: String, rep: Int): Double =
      ((DedupOps.fnv1a64(s"$id#$rep:boot") >>> 11).toDouble /
        9007199254740992.0)
    def w(id: String, rep: Int): Long =
      SamplingOps.poissonCdf.count(t => u(id, rep) >= t).toLong
    def meansOf(g: String): Seq[Double] = {
      val data = rows.filter(_._1 == g)
      (0 until b).flatMap { rep =>
        val n = data.map(r => w(r._3, rep)).sum
        val s = data.map(r => w(r._3, rep) * r._2).sum
        if (n == 0) None else Some(s.toDouble / n.toDouble)
      }
    }
    Seq("a", "c").foreach { g =>
      val ms = meansOf(g).sorted
      val lo = ms(math.max(1, (50 * ms.size + 999) / 1000) - 1)
      val hi = ms(math.max(1, (950 * ms.size + 999) / 1000) - 1)
      val r = got(g)
      assert(r.getDouble(3) == lo && r.getDouble(4) == hi,
        s"$g: got (${r.getDouble(3)}, ${r.getDouble(4)}) want ($lo, $hi)")
      assert(r.getLong(1) == rows.count(_._1 == g))
    }
    // constant-valued group: every resample mean is the value itself
    assert(got("c").getDouble(2) == 7.0 &&
      got("c").getDouble(3) == 7.0 && got("c").getDouble(4) == 7.0)
    // determinism across runs
    val again = SamplingOps.bootstrapCi(rows.toDF("g", "v", "id"),
      "g", "v", "id", b = b).collect().map(_.toString).sorted.toSeq
    assert(again == got.values.map(_.toString).toSeq.sorted)
  }

  test("seasonalProfile: epoch-arithmetic dow/hour, exact ratio " +
      "permille under independence") {
    import spark.implicits._
    // ms = 0 is Thursday 00:00 UTC -> dow 4, hour 0
    val day = 86400000L
    val hour = 3600000L
    val rows = Seq(
      ("k1", 0L), ("k1", 0L + 1000L), // Thu 00 x2
      ("k1", 3 * day + 5 * hour), // Sunday (dow 0) 05
      ("k2", 0L + 500L), // Thu 00
      ("k2", 3 * day + 5 * hour + 1L)) // Sun 05
    val got = TimeSeriesOps.seasonalProfile(
        rows.toDF("k", "ms")
          .withColumn("ts", timestamp_millis(col("ms"))),
        "k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // grand = 5; k1: total 3, Thu00 n=2 slot=3 -> 2*5*1000/(3*3)=1111
    assert(got(("k1", 4, 0)) == ((2L, 3L, 3L, 1111L)), got.toString)
    // k1 Sun05: 1*5*1000/(3*2) = 833
    assert(got(("k1", 0, 5)) == ((1L, 3L, 2L, 833L)))
    // k2 Thu00: 1*5*1000/(2*3) = 833; k2 Sun05: 1*5*1000/(2*2) = 1250
    assert(got(("k2", 4, 0)) == ((1L, 2L, 3L, 833L)))
    assert(got(("k2", 0, 5)) == ((1L, 2L, 2L, 1250L)))
  }

  test("seasonalProfile: pre-1970 timestamps floor into the correct " +
      "slot (ADVICE r14 — div truncation would land them a day late)") {
    import spark.implicits._
    // ms = -1 is Wed 1969-12-31 23:59:59.999 UTC -> dow 3, hour 23;
    // truncate-toward-zero would read day 0 / hour 0 -> Thu 00 (wrong).
    // ms = -86400000 is Wed 1969-12-31 00:00 UTC -> dow 3, hour 0.
    val rows = Seq(("k", -1L), ("k", -86400000L), ("k", 0L))
    val got = TimeSeriesOps.seasonalProfile(
        rows.toDF("k", "ms")
          .withColumn("ts", timestamp_millis(col("ms"))),
        "k", "ts")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == Map((3, 23) -> 1L, (3, 0) -> 1L, (4, 0) -> 1L),
      got.toString)
  }

  test("bootstrapCi: NULL ids and NULL values are excluded from the " +
      "mean AND the resamples (ADVICE r14 — populations must agree)") {
    import spark.implicits._
    val rows = Seq(
      ("g", Some("a"), Some(10L)),
      ("g", Some("b"), Some(20L)),
      ("g", None, Some(100000L)), // null id: no deterministic resample
      ("g", Some("c"), None)) // null value: contributes nothing
    val got = SamplingOps.bootstrapCi(
        rows.toDF("g", "id", "v"), "g", "v", "id", b = 8).head()
    assert(got.getLong(1) == 2L, s"n: $got")
    assert(got.getDouble(2) == 15.0, s"mean: $got")
    // every resample mean is a mean of a sub-multiset of {10, 20}
    assert(got.getDouble(3) >= 10.0 && got.getDouble(4) <= 20.0, got)
  }
}
