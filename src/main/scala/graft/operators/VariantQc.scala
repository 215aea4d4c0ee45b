package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Variant / callset quality-control censuses — the bcftools-stats /
  * CollectVariantCallingMetrics / peddy family a production genomics
  * pipeline runs after every call set lands, re-expressed as exact
  * integer Spark aggregations (the reference delegates these to
  * downstream tools; at 100 TB they belong in the engine, next to the
  * data).
  *
  * Every operator here follows the engine-parity conventions
  * (queries/Q.scala): exact integer counts in the aggregation, at most
  * ONE double division per output column, so a DuckDB oracle replays
  * the result bit-for-bit.
  */
object VariantQc {

  private val dec = DecimalType(38, 0)

  /** Transition/transversion census per group — the first sanity number
    * a geneticist reads off a call set (genome-wide Ts/Tv ≈ 2.0-2.1;
    * a ratio near 0.5 = random noise). SNVs only: single-base
    * REF != ALT, both in ACGT; transitions are A<->G and C<->T.
    *
    * Output per group: (groupCol, n_snv, n_ts, n_tv, tstv) — tstv NULL
    * when n_tv = 0.
    *
    * Scale: ONE map-side-combined keyed aggregation; the SNV/transition
    * classification is per-row codegen'd CASE logic, no UDF. */
  def tstvRatio(variants: DataFrame, groupCol: String,
      refCol: String = "referenceAllele",
      altCol: String = "alternateAllele"): DataFrame = {
    val r = upper(col(refCol))
    val a = upper(col(altCol))
    val isSnv = length(r) === 1 && length(a) === 1 && r =!= a &&
      r.isin("A", "C", "G", "T") && a.isin("A", "C", "G", "T")
    val isTs = (r.isin("A", "G") && a.isin("A", "G")) ||
      (r.isin("C", "T") && a.isin("C", "T"))
    variants
      .groupBy(groupCol)
      .agg(
        sum(when(isSnv, 1L).otherwise(0L)).as("n_snv"),
        sum(when(isSnv && isTs, 1L).otherwise(0L)).as("n_ts"),
        sum(when(isSnv && !isTs, 1L).otherwise(0L)).as("n_tv"))
      .select(col(groupCol), col("n_snv"), col("n_ts"), col("n_tv"),
        when(col("n_tv") === 0, lit(null).cast("double"))
          .otherwise(col("n_ts").cast("double") /
            col("n_tv").cast("double")).as("tstv"))
  }

  /** Hardy-Weinberg equilibrium chi-square per site from biallelic
    * genotype classes (`gtClass` = alt-allele count 0/1/2) — the
    * population-genetics QC that flags genotyping artifacts (excess
    * heterozygosity) site by site.
    *
    * Uses the closed form chi2 = n·(4·nAA·naa − nAa²)² /
    * ((2·nAA+nAa)²·(2·naa+nAa)²) — algebraically identical to the
    * textbook Σ(obs−exp)²/exp but with every term an exact DECIMAL
    * integer and the result ONE double division (engine-identical;
    * verified against the direct form in the spec). Monomorphic sites
    * (an allele absent) report NULL chi2 (HWE is undefined). maf is the
    * minor-allele fraction, one double division.
    *
    * Output per site: (siteCol, n, n_hom_ref, n_het, n_hom_alt, maf,
    * chi2).
    *
    * Scale: ONE map-side-combined keyed aggregation; site cardinality
    * unbounded (per-site rows only ever merge, never sort). */
  def hardyWeinberg(genotypes: DataFrame, siteCol: String,
      gtClassCol: String): DataFrame = {
    val g = col(gtClassCol)
    val agg = genotypes
      .groupBy(siteCol)
      .agg(count(lit(1)).as("n"),
        sum(when(g === 0, 1L).otherwise(0L)).cast(dec).as("__a"),
        sum(when(g === 1, 1L).otherwise(0L)).cast(dec).as("__h"),
        sum(when(g === 2, 1L).otherwise(0L)).cast(dec).as("__c"))
    val refAlleles = (lit(2).cast(dec) * col("__a") + col("__h")).cast(dec)
    val altAlleles = (lit(2).cast(dec) * col("__c") + col("__h")).cast(dec)
    val dev = (lit(4).cast(dec) * col("__a") * col("__c") -
      col("__h") * col("__h")).cast(dec)
    agg.select(col(siteCol), col("n"),
      col("__a").cast("long").as("n_hom_ref"),
      col("__h").cast("long").as("n_het"),
      col("__c").cast("long").as("n_hom_alt"),
      when(col("n") === 0, lit(null).cast("double"))
        .otherwise(least(refAlleles, altAlleles).cast("double") /
          (lit(2).cast(dec) * col("n")).cast("double")).as("maf"),
      // the chi2 integers exceed 2^53 at population scale — enter
      // double-land through the engine-identical limb split, never a
      // direct wide-decimal cast (DuckDB's HUGEINT->DOUBLE is not
      // correctly rounded past 2^53; the q199 recipe)
      when(refAlleles === 0 || altAlleles === 0,
        lit(null).cast("double"))
        .otherwise(
          Stats.limbDouble((col("n").cast(dec) * dev * dev).cast(dec)) /
            Stats.limbDouble(
              (refAlleles * refAlleles * altAlleles * altAlleles)
                .cast(dec))).as("chi2"))
  }

  /** Genotype concordance grid between two callsets — the GIAB-style
    * benchmarking core ("how does my pipeline's call set compare to the
    * truth set?"): a null-safe full-outer join on the site/sample keys,
    * classes missing on one side count as 'MISSING', and the output is
    * the bounded |classes+1|² confusion grid.
    *
    * Output: (class_a, class_b, n).
    *
    * Scale: ONE keyed shuffle join (both sides hash-partitioned on the
    * keys — data never broadcasts) + a map-side-combined count of the
    * bounded grid. */
  def genotypeConcordance(a: DataFrame, b: DataFrame,
      keyCols: Seq[String], classCol: String): DataFrame = {
    require(keyCols.nonEmpty, "genotypeConcordance needs join keys")
    val la = a.select(keyCols.map(col) :+
      col(classCol).cast("string").as("__ca"): _*)
    val lb = b.select(keyCols.map(col) :+
      col(classCol).cast("string").as("__cb"): _*)
    la.join(lb, keyCols, "full_outer")
      .select(coalesce(col("__ca"), lit("MISSING")).as("class_a"),
        coalesce(col("__cb"), lit("MISSING")).as("class_b"))
      .groupBy("class_a", "class_b")
      .agg(count(lit(1)).as("n"))
  }

  /** Allele-frequency spectrum — the site-frequency histogram every
    * population callset is summarized by: allele count `acCol` over
    * allele number `anCol` binned into `bins` equal-width frequency
    * bins (`bin = ac·bins div an`, the ac == an edge clamped into the
    * last bin). Rows with NULL or non-positive AN are excluded (no
    * frequency is defined).
    *
    * Output per bin: (bin, n_sites).
    *
    * Scale: per-row integer arithmetic + ONE map-side-combined count of
    * the bounded bin grid. */
  def alleleFrequencySpectrum(variants: DataFrame, acCol: String,
      anCol: String, bins: Int = 20): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val ac = col(acCol).cast("long")
    val an = col(anCol).cast("long")
    variants
      .filter(an.isNotNull && an > 0 && ac.isNotNull && ac >= 0)
      .select(least(
        expr(s"(cast($acCol as bigint) * $bins) div " +
          s"cast($anCol as bigint)"),
        lit(bins - 1L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_sites"))
  }

  /** Coverage-uniformity census per contig from (referenceName, start,
    * end, count) coverage intervals — the evenness check behind "is 30x
    * mean coverage actually 30x everywhere, or 300x in repeats and 3x
    * in GC deserts": integer-floor mean depth and the permille of bases
    * whose depth lies within ±50 % of that mean (2·depth in
    * [mean, 3·mean]).
    *
    * Output per contig: (referenceName, bases, mean_depth,
    * within_band_permille).
    *
    * Scale: TWO map-side-combined scans and zero wide exchanges — the
    * per-contig means (bounded: one row per contig) broadcast back onto
    * the second scan instead of windowing the data by contig (25
    * contigs would mean 25-task skew at 100 TB). */
  def coverageUniformity(coverage: DataFrame): DataFrame = {
    val len = (col("end") - col("start")).cast(dec)
    val means = coverage
      .groupBy("referenceName")
      .agg(sum(len).cast(dec).as("__bases"),
        sum((len * col("count").cast(dec)).cast(dec)).cast(dec)
          .as("__wsum"))
      .select(col("referenceName"),
        col("__bases").cast("long").as("bases"),
        ((col("__wsum") - pmod(col("__wsum"), col("__bases"))) /
          col("__bases")).cast("long").as("mean_depth"))
    coverage
      .join(broadcast(means), Seq("referenceName"))
      .groupBy(col("referenceName"), col("bases"), col("mean_depth"))
      .agg(sum(when(col("count").cast("long") * 2 >= col("mean_depth") &&
          col("count").cast("long") * 2 <= col("mean_depth") * 3,
        (col("end") - col("start")).cast("long")).otherwise(0L))
        .as("__in"))
      .select(col("referenceName"), col("bases"), col("mean_depth"),
        expr("__in * 1000 div bases").as("within_band_permille"))
  }

  /** Mendelian-consistency grid over trio genotype classes (0/1/2 =
    * child/mother/father alt-allele counts) — the pedigree QC that
    * catches sample swaps and genotyping error: a child genotype is a
    * violation when no combination of one maternal and one paternal
    * allele can produce it (biallelic autosomal rules).
    *
    * Output: the bounded 27-row (father_gt, mother_gt, child_gt, n,
    * violation) grid — callers sum `n where violation` for the rate.
    *
    * Scale: per-row boolean logic + ONE map-side-combined count of the
    * bounded grid. */
  def mendelianViolations(trios: DataFrame, fatherCol: String,
      motherCol: String, childCol: String): DataFrame = {
    val f = col(fatherCol).cast("int")
    val m = col(motherCol).cast("int")
    val c = col(childCol).cast("int")
    val m0 = m <= 1 // mother can donate a ref allele
    val m1 = m >= 1 // mother can donate an alt allele
    val f0 = f <= 1
    val f1 = f >= 1
    val ok = (c === 0 && m0 && f0) ||
      (c === 2 && m1 && f1) ||
      (c === 1 && ((m0 && f1) || (m1 && f0)))
    trios
      .select(f.as("father_gt"), m.as("mother_gt"), c.as("child_gt"),
        (!ok).as("violation"))
      .groupBy("father_gt", "mother_gt", "child_gt", "violation")
      .agg(count(lit(1)).as("n"))
  }
}
