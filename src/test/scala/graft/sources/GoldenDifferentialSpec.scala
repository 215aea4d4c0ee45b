package graft.sources

import graft.SparkSpec
import graft.algorithms.{Bqsr, RealignIndels}
import graft.core.ReferenceContigs
import graft.model.Alignment

/** Differential tests against the reference repo's checked-in CROSS-TOOL
  * goldens (adam-core/src/test/resources) — real output of OTHER tools
  * (GATK, freebayes, GIAB pipelines, samtools), not fixtures we built:
  *
  *  - `bqsr1-ref.observed`: the GATK-produced BQSR observation table the
  *    reference gates BaseQualityRecalibrationSuite on. We must reproduce
  *    it cell-for-cell from `bqsr1.sam` + `bqsr1.vcf`.
  *  - `artificial.realigned.sam`: GATK IndelRealigner's output for
  *    `artificial.sam`+`artificial.fa` (RealignIndelsSuite contract:
  *    same read count; read4's name/start/cigar/mapq equal).
  *  - `NA12878.chr22.tiny.freebayes.vcf` + the GIAB HG001 excerpt: real
  *    freebayes/GIAB VCF complexity round-tripped through VcfIO.
  *  - `artificial.cram`: CRAM bytes produced by another tool, decoded by
  *    CramIO and field-compared against its SAM twin.
  *
  * These files are the only external ground truth available offline
  * (htsjdk is absent from the coursier cache), so this suite is the
  * validation of the algorithm/format stack against other tools' actual
  * output rather than self-built fixtures.
  */
class GoldenDifferentialSpec extends SparkSpec {

  private val res = "/root/reference/adam-core/src/test/resources"

  private def haveGoldens: Boolean = new java.io.File(res).isDirectory

  test("BQSR observation table matches the GATK golden cell-for-cell") {
    assume(haveGoldens)
    val reads = SamIO.read(spark, s"$res/bqsr1.sam")
    val variants = VcfIO.readVariants(spark, s"$res/bqsr1.vcf")
    val mask = Bqsr.SnpMask.fromVariants(variants.ds.toDF())
    val obs = Bqsr.observationDF(reads.ds,
      (ref, pos) => mask.contains(ref, pos)).collect()

    // render exactly as the reference's ObservationTable.toCSV does
    // (ObservationTable.scala:37-49): ReadGroup,ReportedQ,Cycle,Dinuc,
    // TotalCount,MismatchCount,EmpiricalQ with a trailing "**" cell for
    // covariates containing an N dinucleotide
    val ours = obs.map { r =>
      val dinuc = r.getString(3)
      val base = Seq(r.getString(0), r.getInt(1).toString,
        r.getInt(2).toString, dinuc, r.getLong(4).toString,
        r.getLong(5).toString,
        Bqsr.empiricalQuality(r.getLong(4), r.getLong(5)).toString)
      (if (dinuc == "NN") base :+ "**" else base).mkString(",")
    }.toSeq.sorted

    val src = scala.io.Source.fromFile(s"$res/bqsr1-ref.observed")
    val golden =
      try src.getLines().filter(_.nonEmpty)
        .filterNot(_.startsWith("ReadGroup,")).toList.sorted
      finally src.close()

    assert(ours.length == golden.length,
      s"row count ${ours.length} vs golden ${golden.length}")
    ours.zip(golden).zipWithIndex.foreach { case ((o, g), i) =>
      assert(o == g, s"first divergence at sorted row $i")
    }
  }

  test("realignIndels reproduces GATK IndelRealigner on artificial.sam") {
    assume(haveGoldens)
    val reads = SamIO.read(spark, s"$res/artificial.sam")
    val fasta = ReferenceContigs.fromFasta(spark, s"$res/artificial.fa")
    val realigned = RealignIndels(reads.ds, fasta)
      .collect().sortBy(r => (r.start.getOrElse(-1L), r.readName.getOrElse("")))
    val golden = SamIO.read(spark, s"$res/artificial.realigned.sam")
      .ds.collect().sortBy(r => (r.start.getOrElse(-1L), r.readName.getOrElse("")))

    assert(realigned.length == golden.length)
    // the reference's own golden contract (RealignIndelsSuite:184-200):
    // read4 must match GATK on name/start/cigar/mappingQuality
    def key(r: Alignment) = (r.readName, r.readInFragment, r.start, r.cigar,
      r.mappingQuality)
    val oursR4 = realigned.filter(_.readName.contains("read4")).map(key).toSeq
    val goldR4 = golden.filter(_.readName.contains("read4")).map(key).toSeq
    assert(oursR4 == goldR4, s"read4: $oursR4 vs golden $goldR4")
  }

  test("freebayes NA12878 VCF round-trips through VcfIO unchanged") {
    assume(haveGoldens)
    roundTripVcf(s"$res/NA12878.chr22.tiny.freebayes.vcf")
  }

  test("GIAB HG001 high-confidence VCF excerpt round-trips unchanged") {
    assume(haveGoldens)
    roundTripVcf(s"$res/HG001_GRCh38_GIAB_highconf_CG-IllFB-IllGATKHC-Ion" +
      "-10X-SOLID_CHROM1-X_v.3.3.2_all.fixed-phase-set.excerpt.vcf")
  }

  /** load(x) -> write -> load must be a fixed point at the parsed-record
    * level: the second read sees exactly the contexts of the first. */
  private def roundTripVcf(path: String): Unit = {
    val b = VcfIO.read(spark, path)
    val out = s"${tmpDir()}/rt.vcf"
    VcfIO.write(b.contexts, b.meta, b.samples, out, asSingleFile = true)
    val b2 = VcfIO.read(spark, out)
    assert(b2.samples == b.samples)
    val first = b.contexts.collect()
    val second = b2.contexts.collect()
    assert(first.length == second.length,
      s"${first.length} contexts vs ${second.length} after round-trip")
    val key = (v: graft.model.VariantContext) =>
      (v.variant.flatMap(_.referenceName).getOrElse(""),
        v.variant.flatMap(_.start).getOrElse(-1L),
        v.variant.flatMap(_.alternateAllele).getOrElse(""))
    // splitFromMultiAllelic is load provenance, not site content: a
    // multi-allelic source line is split into per-alt contexts on read,
    // and the writer emits each as a standalone biallelic line — the
    // re-read correctly reports false. Everything else must be identical.
    def norm(v: graft.model.VariantContext): graft.model.VariantContext = {
      def nv(x: Option[graft.model.Variant]) =
        x.map(_.copy(splitFromMultiAllelic = None))
      v.copy(variant = nv(v.variant),
        genotypes = v.genotypes.map(g => g.copy(variant = nv(g.variant),
          splitFromMultiAllelic = None)))
    }
    first.sortBy(key).zip(second.sortBy(key)).zipWithIndex.foreach {
      case ((a, c), i) => assert(norm(a) == norm(c), s"context $i differs")
    }
  }

  test("externally-produced artificial.cram decodes to its SAM twin") {
    assume(haveGoldens)
    val fromCram = CramIO.read(spark, s"$res/artificial.cram",
      ReferenceContigs.fromFasta(spark, s"$res/artificial.fa"))
      .ds.collect()
    val fromSam = SamIO.read(spark, s"$res/artificial.sam").ds.collect()
    assert(fromCram.length == fromSam.length)
    def key(r: Alignment) = (r.readName, r.readInFragment)
    val cramBy = fromCram.map(r => key(r) -> r).toMap
    fromSam.foreach { s =>
      val c = cramBy(key(s))
      assert(c.start == s.start, s"start for ${key(s)}")
      assert(c.cigar == s.cigar, s"cigar for ${key(s)}")
      assert(c.sequence == s.sequence, s"sequence for ${key(s)}")
      assert(c.qualityScores == s.qualityScores, s"quals for ${key(s)}")
      assert(c.readNegativeStrand == s.readNegativeStrand &&
        c.readPaired == s.readPaired && c.properPair == s.properPair &&
        c.duplicateRead == s.duplicateRead, s"flags for ${key(s)}")
    }
  }
}
