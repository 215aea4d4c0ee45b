package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 operators vs hand references: KING kinship, inbreeding F,
  * substitution matrix, indel spectrum, call rate, conformal coverage,
  * confident-learning grid. */
class Round15OpsSpec extends SparkSpec {

  test("kingKinship: identical samples = 0.5, hand pair census, " +
      "null/out-of-range gt excluded") {
    import spark.implicits._
    // A and B identical; C opposite-homozygous against A at 2 sites
    val rows = Seq(
      (1L, "A", Some(1)), (1L, "B", Some(1)), (1L, "C", Some(2)),
      (2L, "A", Some(1)), (2L, "B", Some(1)), (2L, "C", Some(1)),
      (3L, "A", Some(0)), (3L, "B", Some(0)), (3L, "C", Some(2)),
      (4L, "A", Some(2)), (4L, "B", Some(2)), (4L, "C", Some(0)),
      (5L, "A", None), (5L, "C", Some(3))) // both excluded
    val got = VariantQc.kingKinship(
        rows.toDF("site", "sample_id", "gt"), "sample_id", "site", "gt")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7))).toMap
    // (A,B): identical -> phi = (2 - 0) / (2 + 2) = 0.5
    assert(got(("A", "B")) == ((4L, 2L, 0L, 2L, 2L, 0.5)), got.toString)
    // (A,C): both-het site2 only; opp-hom sites 3,4; hets A=2, C=1
    // phi = (1 - 4) / 3 = -1.0
    assert(got(("A", "C")) == ((4L, 1L, 2L, 2L, 1L, -1.0)))
    assert(got(("B", "C")) == ((4L, 1L, 2L, 2L, 1L, -1.0)))
    assert(got.size == 3)
  }

  test("kingKinship: an oversized cohort fails LOUDLY (bounded-cohort " +
      "contract is self-defending)") {
    import spark.implicits._
    val rows = (0L until 30L).map(i => (i % 5, s"s$i", (i % 3).toInt))
    val e = intercept[Exception] {
      VariantQc.kingKinship(rows.toDF("site", "sample_id", "gt"),
        "sample_id", "site", "gt", maxSamples = 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("quadratic")),
      s"expected the loud cohort message, got: ${msgs(e)}")
  }

  test("inbreedingF: hand expected-het chain, exact quantized floors") {
    import spark.implicits._
    // site1: ac=2, an=6 -> q = floor(2*2*4*1e7 / 36) = 4444444
    // site2: ac=3, an=6 -> q = 18e7 / 36 = 5000000
    val rows = Seq(
      (1L, "A", 0), (1L, "B", 1), (1L, "C", 1),
      (2L, "A", 1), (2L, "B", 1), (2L, "C", 1))
    val got = VariantQc.inbreedingF(
        rows.toDF("site", "sample_id", "gt"), "sample_id", "site", "gt")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ehetq = 4444444L + 5000000L
    val expHet = ehetq.toDouble / 1e7
    def f(nHet: Long) = 1.0 - (nHet * 10000000L).toDouble / ehetq.toDouble
    assert(got("A") == ((2L, 1L, expHet, f(1L))), got.toString)
    assert(got("B") == ((2L, 2L, expHet, f(2L))))
    assert(got("C") == ((2L, 2L, expHet, f(2L))))
  }

  test("inbreedingF: all-monomorphic cohort reports NULL f") {
    import spark.implicits._
    val rows = Seq((1L, "A", 0), (1L, "B", 0), (2L, "A", 2), (2L, "B", 2))
    val got = VariantQc.inbreedingF(
        rows.toDF("site", "sample_id", "gt"), "sample_id", "site", "gt")
      .collect()
    assert(got.forall(_.isNullAt(4)), got.mkString(";"))
    assert(got.forall(_.getDouble(3) == 0.0)) // exp_het exactly 0
  }

  test("substitutionMatrix: hand census with exact permille, non-SNVs " +
      "excluded, lowercase normalized") {
    import spark.implicits._
    val rows = Seq(("a", "g"), ("A", "G"), ("A", "G"), ("C", "T"),
      ("AT", "A"), ("A", "A"), ("N", "G"))
    val got = VariantQc.substitutionMatrix(
        rows.toDF("referenceAllele", "alternateAllele"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("A", "G") -> ((3L, 750L)),
      ("C", "T") -> ((1L, 250L))), got.toString)
  }

  test("indelLengthSpectrum: hand deltas, N alleles excluded, edge " +
      "bins clamp") {
    import spark.implicits._
    val rows = Seq(
      ("A", "AT"), // +1
      ("ACGT", "A"), // -3
      ("A", "ACGTACGTAC"), // +9 -> clamps to +4
      ("AN", "A"), // N -> excluded
      ("AC", "GT")) // equal length -> excluded
    val got = VariantQc.indelLengthSpectrum(
        rows.toDF("referenceAllele", "alternateAllele"), maxAbsLen = 4)
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, -3 -> 1L, 4 -> 1L), got.toString)
  }

  test("callRate: hand census with missing and out-of-range classes") {
    import spark.implicits._
    val rows = Seq(("s1", Some(0)), ("s1", Some(1)), ("s1", Some(2)),
      ("s1", None), ("s1", Some(7)), ("s2", None))
    val got = VariantQc.callRate(rows.toDF("sample_id", "gt"),
        "sample_id", "gt")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7),
          if (r.isNullAt(8)) -1L else r.getLong(8))).toMap
    assert(got("s1") == ((5L, 4L, 1L, 1L, 1L, 1L, 800L, 250L)),
      got.toString)
    // all-missing sample: call rate 0, het share undefined
    assert(got("s2") == ((1L, 0L, 0L, 0L, 0L, 0L, 0L, -1L)))
  }

  test("conformalCoverage: hand finite-sample rank, achieved coverage, " +
      "empty calibration degenerates to NULL threshold") {
    import spark.implicits._
    val cal = (1L to 10L).map(v => Tuple1(v)).toDF("score")
    val eval = Seq(5L, 15L, 10L).map(Tuple1(_)).toDF("score")
    // alpha 100: k = ceil(11 * 900 / 1000) = 10 -> threshold 10
    val r = LabelQaOps.conformalCoverage(cal, eval, "score", 100).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((10L, 10L, 3L, 2L, 666L)), r.toString)
    // alpha 500: k = ceil(11 * 500 / 1000) = 6 -> threshold 6
    val r2 = LabelQaOps.conformalCoverage(cal, eval, "score", 500).head()
    assert(r2.getLong(1) == 6L && r2.getLong(3) == 1L, r2.toString)
    // empty calibration: NULL threshold, zero coverage, eval intact
    val r3 = LabelQaOps.conformalCoverage(cal.filter(col("score") > 99),
      eval, "score", 100).head()
    assert(r3.getLong(0) == 0L && r3.isNullAt(1) &&
      r3.getLong(2) == 3L && r3.getLong(3) == 0L, r3.toString)
  }

  test("conformalCoverage: an unquantized high-cardinality score " +
      "column fails LOUDLY (caller-quantizes contract)") {
    import spark.implicits._
    val cal = (0L until 300L).map(Tuple1(_)).toDF("score")
    val e = intercept[Exception] {
      LabelQaOps.conformalCoverage(cal, cal, "score", 100,
        maxGridRows = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("quantize")),
      s"expected the loud contract message, got: ${msgs(e)}")
  }

  test("confidentLearningGrid: hand thresholds via integer " +
      "cross-multiply, ties count as confident") {
    import spark.implicits._
    // t_A = mean(600, 400) = 500 (sum 1000, n 2); t_B = mean(800, 500)
    // = 650 (sum 1300, n 2)
    val rows = Seq(
      ("A", "B", 600L), // 600*1 < 800  -> not confident
      ("A", "A", 400L), // 400*2 < 1000 -> not confident
      ("B", "A", 800L), // 800*2 >= 1000 -> confident
      ("B", "A", 500L)) // 500*2 >= 1000 -> confident (tie)
    val got = LabelQaOps.confidentLearningGrid(
        rows.toDF("g", "p", "conf"), "g", "p", "conf")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("A", "B") -> ((1L, 0L)),
      ("A", "A") -> ((1L, 0L)), ("B", "A") -> ((2L, 2L))), got.toString)
  }
}
