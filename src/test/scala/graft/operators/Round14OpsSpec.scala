package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 variant-QC censuses vs hand references: Ts/Tv, Hardy-
  * Weinberg (closed form vs the textbook chi-square), genotype
  * concordance, AF spectrum, coverage uniformity, Mendelian grid. */
class Round14OpsSpec extends SparkSpec {

  test("tstvRatio: SNV classification, transition split, tv=0 -> NULL") {
    import spark.implicits._
    val rows = Seq(
      ("g1", "A", "G"), // ts
      ("g1", "C", "T"), // ts
      ("g1", "A", "C"), // tv
      ("g1", "AT", "A"), // indel: not an SNV
      ("g1", "A", "A"), // ref == alt: not an SNV
      ("g1", "N", "A"), // non-ACGT ref: not an SNV
      ("g2", "G", "A"), // ts
      ("g2", "T", "G"), // tv
      ("g2", null, "A"), // NULL ref: not an SNV (r15 advice: must not
      ("g2", "G", null), // fall through to "tv" via three-valued logic)
      ("g3", "t", "c")) // lowercase ts only — tv = 0
    val got = VariantQc.tstvRatio(
        rows.toDF("g", "referenceAllele", "alternateAllele"), "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got("g1") == ((3L, 2L, 1L, Some(2.0))))
    assert(got("g2") == ((2L, 1L, 1L, Some(1.0))))
    assert(got("g3") == ((1L, 1L, 0L, None)), "tv = 0 must be NULL")
  }

  test("hardyWeinberg: closed form equals the textbook chi-square; " +
      "monomorphic sites are NULL") {
    import spark.implicits._
    // site s1: 50 hom-ref / 30 het / 20 hom-alt
    val s1 = (1 to 50).map(_ => ("s1", 0)) ++
      (1 to 30).map(_ => ("s1", 1)) ++ (1 to 20).map(_ => ("s1", 2))
    // site s2: monomorphic (all hom-ref)
    val s2 = (1 to 10).map(_ => ("s2", 0))
    val got = VariantQc.hardyWeinberg(
        (s1 ++ s2).toDF("site", "gt"), "site", "gt")
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = got("s1")
    assert(r1.getLong(1) == 100L && r1.getLong(2) == 50L &&
      r1.getLong(3) == 30L && r1.getLong(4) == 20L)
    assert(r1.getDouble(5) == 70.0 / 200.0) // maf
    // textbook chi-square: exp = (n p^2, 2npq, n q^2), p = 130/200
    val (n, p) = (100.0, 0.65)
    val q = 1 - p
    val (eAA, eAa, eaa) = (n * p * p, 2 * n * p * q, n * q * q)
    val direct = math.pow(50 - eAA, 2) / eAA +
      math.pow(30 - eAa, 2) / eAa + math.pow(20 - eaa, 2) / eaa
    assert(math.abs(r1.getDouble(6) - direct) < 1e-9,
      s"closed form ${r1.getDouble(6)} vs direct $direct")
    assert(got("s2").isNullAt(6), "monomorphic site must be NULL")
    assert(got("s2").getDouble(5) == 0.0, "monomorphic maf is 0")
  }

  test("genotypeConcordance: confusion grid with MISSING on both sides") {
    import spark.implicits._
    val a = Seq((1L, "HET"), (2L, "HOM_REF"), (3L, "HET")) // 4 missing
    val b = Seq((1L, "HET"), (2L, "HET"), (4L, "HOM_ALT")) // 3 missing
    val got = VariantQc.genotypeConcordance(
        a.toDF("k", "cls"), b.toDF("k", "cls"), Seq("k"), "cls")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("HET", "HET") -> 1L,
      ("HOM_REF", "HET") -> 1L,
      ("HET", "MISSING") -> 1L,
      ("MISSING", "HOM_ALT") -> 1L))
  }

  test("alleleFrequencySpectrum: floor bins, ac == an clamps into the " +
      "last bin, an <= 0 excluded") {
    import spark.implicits._
    val rows = Seq(
      (0L, 100L), // bin 0
      (4L, 100L), // 4*20/100 = 0
      (5L, 100L), // exactly 1
      (50L, 100L), // 10
      (99L, 100L), // 19
      (100L, 100L), // 20 -> clamped 19
      (30L, 60L), // 10
      (1L, 0L)) // excluded
    val got = VariantQc.alleleFrequencySpectrum(
        rows.toDF("ac", "an"), "ac", "an", bins = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 10L -> 2L, 19L -> 2L))
  }

  test("coverageUniformity: integer-floor mean and the ±50% band " +
      "permille, length-weighted") {
    import spark.implicits._
    val rows = Seq(
      ("c1", 0L, 2L, 10L), // len 2, depth 10
      ("c1", 10L, 12L, 20L), // len 2, depth 20
      ("c1", 20L, 21L, 100L)) // len 1, depth 100
    // bases 5, wsum 160, mean 32, band [16, 48] -> only the len-2
    // depth-20 interval is inside -> 2/5 = 400 permille
    val got = VariantQc.coverageUniformity(
        rows.toDF("referenceName", "start", "end", "count")).head()
    assert(got.getLong(1) == 5L && got.getLong(2) == 32L &&
      got.getLong(3) == 400L, got.toString)
  }

  test("mendelianViolations: biallelic trio rules over the full " +
      "3x3x3 grid") {
    import spark.implicits._
    val all = for (f <- 0 to 2; m <- 0 to 2; c <- 0 to 2)
      yield (f, m, c)
    val got = VariantQc.mendelianViolations(
        all.toDF("f", "m", "c"), "f", "m", "c")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getBoolean(3)).toMap
    assert(got.size == 27)
    // hand rules: 0x0 parents -> child must be 0
    assert(!got((0, 0, 0)) && got((0, 0, 1)) && got((0, 0, 2)))
    // 2x2 -> child must be 2
    assert(got((2, 2, 0)) && got((2, 2, 1)) && !got((2, 2, 2)))
    // 0x2 -> child must be het
    assert(got((0, 2, 0)) && !got((0, 2, 1)) && got((0, 2, 2)))
    assert(got((2, 0, 0)) && !got((2, 0, 1)) && got((2, 0, 2)))
    // a het parent pair allows anything
    assert(!got((1, 1, 0)) && !got((1, 1, 1)) && !got((1, 1, 2)))
    // het x hom-ref: child 0 or 1
    assert(!got((1, 0, 0)) && !got((1, 0, 1)) && got((1, 0, 2)))
  }
}
