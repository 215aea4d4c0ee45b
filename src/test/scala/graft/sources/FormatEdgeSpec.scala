package graft.sources

import graft.SparkSpec
import graft.model._
import java.nio.file.{Files, Paths}

/** Round-trip + dispatch coverage for the formats not exercised in IOSpec:
  * NarrowPeak, IntervalList, readFeatures extension dispatch, interleaved
  * FASTQ, and VariantAnnotations typed INFO access. */
class FormatEdgeSpec extends SparkSpec {

  private def fixture(name: String, content: String): String = {
    val p = Paths.get(tmpDir(), name)
    Files.writeString(p, content)
    p.toString
  }

  test("NarrowPeak round trip incl. signal columns") {
    val np = "chr1\t100\t200\tpeak1\t500\t+\t12.5\t3.2\t1.1\t40\n" +
      "chr2\t0\t50\tpeak2\t100\t-\t5.0\t-1\t-1\t-1\n"
    val fs = FeatureIO.readNarrowPeak(spark, fixture("t.narrowPeak", np))
      .collect().sortBy(_.start)
    assert(fs.length == 2)
    val p1 = fs.find(_.name.contains("peak1")).get
    assert(p1.attributes("signalValue") == "12.5")
    assert(p1.attributes("peak") == "40")
    val out = tmpDir() + "/o.narrowPeak"
    import spark.implicits._
    FeatureIO.writeNarrowPeak(spark.createDataset(fs.toSeq), out)
    val rt = FeatureIO.readNarrowPeak(spark, out).collect()
    assert(rt.map(f => (f.name, f.start, f.attributes.get("signalValue"))).toSet ==
      fs.map(f => (f.name, f.start, f.attributes.get("signalValue"))).toSet)
  }

  test("IntervalList round trip with @-header skip") {
    val il = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:10000\n" +
      "chr1\t101\t200\t+\ttarget1\nchr1\t501\t600\t-\ttarget2\n"
    val fs = FeatureIO.readIntervalList(spark, fixture("t.interval_list", il))
      .collect().sortBy(_.start)
    assert(fs.length == 2)
    assert(fs.head.start.contains(100L)) // 1-based closed -> 0-based half-open
    assert(fs.head.end.contains(200L))
    assert(fs.head.strand.contains("FORWARD"))
    assert(fs.head.name.contains("target1"))
    val out = tmpDir() + "/o.interval_list"
    import spark.implicits._
    FeatureIO.writeIntervalList(spark.createDataset(fs.toSeq), out)
    val rt = FeatureIO.readIntervalList(spark, out).collect()
    assert(rt.map(f => (f.name, f.start, f.end)).toSet ==
      fs.map(f => (f.name, f.start, f.end)).toSet)
  }

  test("readFeatures dispatches by extension; unknown rejects") {
    val bed = fixture("d.bed", "chr1\t0\t10\tx\t1\t+\n")
    assert(FeatureIO.readFeatures(spark, bed).count() == 1)
    assertThrows[IllegalArgumentException] {
      FeatureIO.readFeatures(spark, "whatever.xyz")
    }
  }

  test("interleaved FASTQ pairs and validates names") {
    val fq = "@frag1/1\nACGT\n+\nIIII\n@frag1/2\nTTTT\n+\nFFFF\n" +
      "@frag2/1\nGGGG\n+\nIIII\n@frag2/2\nCCCC\n+\nIIII\n"
    val pairs = SequenceIO.readInterleavedFastq(spark, fixture("t.ifq", fq))
      .collect().sortBy(_._1.name)
    assert(pairs.length == 2)
    assert(pairs.head._1.name.contains("frag1/1"))
    assert(pairs.head._2.sequence.contains("TTTT"))
  }

  test("multi-allelic split slices Number=A/R INFO and PL per alternate") {
    val line = "chr1\t100\t.\tA\tC,T\t50\tPASS\t" +
      "AC=3,4;AF=0.3,0.4;AD=90,5,6;DP=100\tGT:PL\t1/2:10,20,30,40,50,60"
    val vcs = VcfIO.parseLine(line, Seq("s1"))
    assert(vcs.length == 2)
    val v0 = vcs(0).variant.get
    assert(v0.annotation("AC") == "3")
    assert(v0.annotation("AF") == "0.3")
    assert(v0.annotation("AD") == "90,5")   // Number=R: ref + this alt
    assert(v0.annotation("DP") == "100")    // Number=1: untouched
    val v1 = vcs(1).variant.get
    assert(v1.annotation("AC") == "4")
    assert(v1.annotation("AF") == "0.4")
    assert(v1.annotation("AD") == "90,6")
    // diploid PL re-index keeping {REF, alt a}: (0,0),(0,a),(a,a)
    assert(vcs(0).genotypes.head.genotypeLikelihoods == Seq(10.0, 20.0, 30.0))
    assert(vcs(1).genotypes.head.genotypeLikelihoods == Seq(10.0, 40.0, 60.0))
    // single-alt records keep PL verbatim
    val single = VcfIO.parseLine(
      "chr1\t200\t.\tG\tC\t50\tPASS\tDP=9\tGT:PL\t0/1:12,0,34", Seq("s1"))
    assert(single.head.genotypes.head.genotypeLikelihoods == Seq(12.0, 0.0, 34.0))
  }

  test("typed FORMAT fields: PS/PQ/SB/MIN_DP, and Number=A/G attribute slicing") {
    val line = "chr1\t300\t.\tA\tC,T\t99\tPASS\tDP=44\t" +
      "GT:DP:MIN_DP:PS:PQ:SB:EC:GP\t" +
      "1|2:30:25:7:40:10,2,9,3:5,6:0.9,0.05,0.01,0.02,0.01,0.01"
    val vcs = VcfIO.parseLine(line, Seq("s1"))
    val g0 = vcs(0).genotypes.head
    assert(g0.readDepth.contains(30))
    assert(g0.minReadDepth.contains(25))
    assert(g0.phaseSetId.contains(7))
    assert(g0.phaseQuality.contains(40))
    assert(g0.phased.contains(true))
    assert(g0.strandBiasComponents == Seq(10, 2, 9, 3))
    assert(g0.splitFromMultiAllelic.contains(true))
    // EC is Number=A (reserved): per-alt element
    assert(g0.attributes("EC") == "5")
    assert(vcs(1).genotypes.head.attributes("EC") == "6")
    // GP is Number=G: diploid re-index (0,0),(0,a),(a,a)
    assert(g0.attributes("GP") == "0.9,0.05,0.01")
    assert(vcs(1).genotypes.head.attributes("GP") == "0.9,0.02,0.01")
  }

  test("GL fallback feeds genotypeLikelihoods when PL absent") {
    val vcs = VcfIO.parseLine(
      "chr1\t400\t.\tG\tA\t50\tPASS\tDP=9\tGT:GL\t0/1:-0.1,-1.2,-3.4",
      Seq("s1"))
    assert(vcs.head.genotypes.head.genotypeLikelihoods == Seq(-0.1, -1.2, -3.4))
  }

  test("triploid PL re-index follows VCF genotype ordering") {
    // 3 alleles (REF + C,T), ploidy 3: full G vector has C(5,3)=10 entries
    // ordered 000,001,011,111,002,012,112,022,122,222. Keeping {REF,T}
    // (a=2) selects 000(0), 002(4), 022(7), 222(9).
    val line = "chr1\t700\t.\tA\tC,T\t50\tPASS\tDP=9\tGT:PL\t" +
      "0/1/2:0,1,2,3,4,5,6,7,8,9"
    val vcs = VcfIO.parseLine(line, Seq("s1"))
    assert(vcs(0).genotypes.head.genotypeLikelihoods ==
      Seq(0.0, 1.0, 2.0, 3.0)) // {REF,C}: 000,001,011,111
    assert(vcs(1).genotypes.head.genotypeLikelihoods ==
      Seq(0.0, 4.0, 7.0, 9.0)) // {REF,T}: 000,002,022,222
  }

  test("gVCF: <NON_REF> reference blocks span to END with no alternate") {
    val block = VcfIO.parseLine(
      "chr1\t1000\t.\tA\t<NON_REF>\t.\t.\tEND=1099\tGT:DP:GQ:MIN_DP\t0/0:33:99:30",
      Seq("s1"))
    assert(block.length == 1)
    val v = block.head.variant.get
    assert(v.alternateAllele.isEmpty, "reference block has no alternate")
    assert(v.start.contains(999L) && v.end.contains(1099L))
    val g = block.head.genotypes.head
    assert(g.alleles == Seq("REF", "REF"))
    assert(g.minReadDepth.contains(30))
    assert(g.alternateReadDepth.isEmpty)
    // VCF 4.3 spells the placeholder <*>
    val star = VcfIO.parseLine(
      "chr1\t2000\t.\tG\t<*>\t.\t.\tEND=2050\tGT\t0/0", Seq("s1"))
    assert(star.head.variant.get.alternateAllele.isEmpty)
    assert(star.head.variant.get.end.contains(2050L))
  }

  test("gVCF: <NON_REF> placeholder keeps its slicing slot but emits no record") {
    val line = "chr1\t500\t.\tA\tC,<NON_REF>\t50\tPASS\t" +
      "AC=3,0;AD=90,5,0;DP=100\tGT:AD:PL\t0/1:90,5,0:10,20,30,40,50,60"
    val vcs = VcfIO.parseLine(line, Seq("s1"))
    assert(vcs.length == 1, "the placeholder must not split into a record")
    val v = vcs.head.variant.get
    assert(v.alternateAllele.contains("C"))
    // Number=A/R slicing still indexes over the full alt list incl. NON_REF
    assert(v.annotation("AC") == "3")
    assert(v.annotation("AD") == "90,5")
    val g = vcs.head.genotypes.head
    assert(g.alleles == Seq("REF", "ALT"))
    assert(g.alternateReadDepth.contains(5))
    // PL re-index keeps {REF, C}: (0,0),(0,1),(1,1)
    assert(g.genotypeLikelihoods == Seq(10.0, 20.0, 30.0))
  }

  test("symbolic alleles take their span from INFO END") {
    val sv = VcfIO.parseLine(
      "chr1\t1000\t.\tN\t<DEL>\t60\tPASS\tSVTYPE=DEL;END=5000", Seq.empty)
    assert(sv.head.variant.get.start.contains(999L))
    assert(sv.head.variant.get.end.contains(5000L))
    assert(sv.head.variant.get.alternateAllele.contains("<DEL>"))
    // no END -> REF span
    val snp = VcfIO.parseLine(
      "chr1\t1000\t.\tAC\tA\t60\tPASS\tDP=5", Seq.empty)
    assert(snp.head.variant.get.end.contains(999L + 2))
  }

  test("breakend + symbolic ALTs round-trip through VcfIO; MATEID/EVENT link") {
    // the VCF 4.2 §5.4 canonical breakend quartet (MATEID + shared EVENT)
    // plus two symbolic records (<DEL> with END span, <DUP:TANDEM>)
    val vcf =
      """##fileformat=VCFv4.2
        |##INFO=<ID=SVTYPE,Number=1,Type=String,Description="SV type">
        |##INFO=<ID=END,Number=1,Type=Integer,Description="End">
        |##INFO=<ID=MATEID,Number=.,Type=String,Description="Mate">
        |##INFO=<ID=EVENT,Number=1,Type=String,Description="Event">
        |##ALT=<ID=DEL,Description="Deletion">
        |##ALT=<ID=DUP:TANDEM,Description="Tandem dup">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |2	321681	bnd_W	G	G]17:198982]	6	PASS	SVTYPE=BND;MATEID=bnd_Y;EVENT=tra1
        |2	321682	bnd_V	T	]13:123456]T	6	PASS	SVTYPE=BND;MATEID=bnd_U;EVENT=tra1
        |13	123456	bnd_U	C	C[2:321682[	6	PASS	SVTYPE=BND;MATEID=bnd_V;EVENT=tra1
        |17	198982	bnd_Y	A	A]2:321681]	6	PASS	SVTYPE=BND;MATEID=bnd_W;EVENT=tra1
        |3	12665100	del1	A	<DEL>	12	PASS	SVTYPE=DEL;END=12686200;EVENT=del_ev
        |4	18665128	dup1	T	<DUP:TANDEM>	11	PASS	SVTYPE=DUP;END=18665204;EVENT=dup_ev
        |""".stripMargin
    val b = VcfIO.read(spark, fixture("sv.vcf", vcf))
    val out = tmpDir() + "/sv_out.vcf"
    VcfIO.write(b.contexts, b.meta, b.samples, out, asSingleFile = true)
    val b2 = VcfIO.read(spark, out)
    val vs = b2.contexts.collect().flatMap(_.variant)
    assert(vs.length == 6)
    // bracket ALTs survive byte-identical, as do MATEID/EVENT INFO entries
    val w = vs.find(_.names == Seq("bnd_W")).get
    assert(w.alternateAllele.contains("G]17:198982]"))
    assert(w.annotation("MATEID") == "bnd_Y" && w.annotation("EVENT") == "tra1")
    // symbolic span re-derives from the round-tripped INFO END
    val del = vs.find(_.names == Seq("del1")).get
    assert(del.alternateAllele.contains("<DEL>"))
    assert(del.start.contains(12665099L) && del.end.contains(12686200L))
    val dup = vs.find(_.names == Seq("dup1")).get
    assert(dup.alternateAllele.contains("<DUP:TANDEM>"))
    assert(dup.end.contains(18665204L))
    // the round-tripped records still link: 4 breakends, all via MATEID
    import org.apache.spark.sql.functions.col
    val varDf = b2.contexts.toDF().selectExpr("variant.referenceName",
      "variant.start", "variant.names", "variant.alternateAllele",
      "variant.annotation")
    val linked = graft.operators.StructuralVariants.linkBreakends(varDf)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[String]("mate_id"), r.getAs[String]("via"))).toMap
    assert(linked.keySet == Set("bnd_W", "bnd_V", "bnd_U", "bnd_Y"))
    assert(linked("bnd_W") == ("bnd_Y", "mateid"))
    assert(linked("bnd_U") == ("bnd_V", "mateid"))
    // EVENT grouping: tra1 holds the 4 breakends across contigs 2/13/17
    val ev = graft.operators.StructuralVariants.eventGroups(varDf)
      .collect().map(r => r.getAs[String]("event") ->
        (r.getAs[Long]("n_records"), r.getAs[Long]("n_breakends"),
          r.getAs[Seq[String]]("referenceNames"))).toMap
    assert(ev("tra1") == ((4L, 4L, Seq("13", "17", "2"))))
    assert(ev("del_ev") == ((1L, 0L, Seq("3"))))
    assert(ev("dup_ev") == ((1L, 0L, Seq("4"))))
  }

  test("hostile: htsjdk-styled symbolic-allele attribute VCF (CNV alts, " +
      "Number=A SVLEN, CIPOS/CIEND, IMPRECISE) round-trips to a fixed point") {
    // htsjdk VariantContextConverter's symbolic-allele attribute surface:
    // multi-allelic copy-number alts <CN0>,<CN2> with per-alt (Number=A)
    // SVLEN, fixed-pair (Number=2) confidence intervals with NEGATIVE
    // values, a bare IMPRECISE flag, and an <INS> whose span falls back to
    // the REF length because htsjdk omits END for insertions.
    val vcf =
      """##fileformat=VCFv4.2
        |##INFO=<ID=SVTYPE,Number=1,Type=String,Description="SV type">
        |##INFO=<ID=END,Number=1,Type=Integer,Description="End">
        |##INFO=<ID=SVLEN,Number=A,Type=Integer,Description="Length per alt">
        |##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="CI around POS">
        |##INFO=<ID=CIEND,Number=2,Type=Integer,Description="CI around END">
        |##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="Imprecise">
        |##ALT=<ID=CN0,Description="CN0">
        |##ALT=<ID=CN2,Description="CN2">
        |##ALT=<ID=INS,Description="Insertion">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |1	5000	cnv1	N	<CN0>,<CN2>	40	PASS	IMPRECISE;SVTYPE=CNV;END=9000;SVLEN=-4000,4000;CIPOS=-56,20;CIEND=-10,62
        |1	12000	ins1	T	<INS>	50	PASS	SVTYPE=INS;SVLEN=312
        |""".stripMargin
    val b = VcfIO.read(spark, fixture("htsjdk_sv.vcf", vcf))
    def key(v: graft.model.Variant) =
      (v.alternateAllele.get, v.start.get, v.end.get,
        v.annotation.get("SVLEN"), v.annotation.get("CIPOS"),
        v.annotation.get("CIEND"), v.annotation.get("IMPRECISE"))
    val vs1 = b.contexts.collect().flatMap(_.variant)
    assert(vs1.length == 3)
    // Number=A slicing assigns each CN alt ITS OwN SVLEN; Number=2 pairs
    // stay whole (never sliced); the flag materializes as "true"
    assert(key(vs1.find(_.alternateAllele.contains("<CN0>")).get) ==
      (("<CN0>", 4999L, 9000L, Some("-4000"), Some("-56,20"),
        Some("-10,62"), Some("true"))))
    assert(key(vs1.find(_.alternateAllele.contains("<CN2>")).get) ==
      (("<CN2>", 4999L, 9000L, Some("4000"), Some("-56,20"),
        Some("-10,62"), Some("true"))))
    // no END -> REF-length span (htsjdk insertion convention)
    assert(key(vs1.find(_.alternateAllele.contains("<INS>")).get) ==
      (("<INS>", 11999L, 12000L, Some("312"), None, None, None)))
    // write (split records become single-alt lines with sliced INFO) and
    // re-read: the attribute surface must be a FIXED POINT
    val out = tmpDir() + "/htsjdk_sv_out.vcf"
    VcfIO.write(b.contexts, b.meta, b.samples, out, asSingleFile = true)
    val vs2 = VcfIO.read(spark, out).contexts.collect().flatMap(_.variant)
    assert(vs2.map(key).toSet == vs1.map(key).toSet)
  }

  test("hostile: spanning-deletion * alt splits like any alternate " +
      "(the converter contract: only <NON_REF>/<*> are placeholders)") {
    // VCF 4.3's bare * (overlapping deletion) is a REAL alternate — the
    // reference converter special-cases only the <NON_REF> placeholder
    // (VariantContextConverter.scala:370-440), so * must become its own
    // split record with Number=A/R/G slicing at its allele index
    val line = "chr1\t200\t.\tGCA\tG,*\t30\tPASS\tAC=3,1;AN=4;DP=20\t" +
      "GT:AD:PL:DP\t1/2:12,5,3:50,20,10,40,15,35:20"
    val vcs = VcfIO.parseLine(line, Seq("s1"))
    assert(vcs.length == 2)
    val delRec = vcs.find(_.variant.get.alternateAllele.contains("G")).get
    val starRec = vcs.find(_.variant.get.alternateAllele.contains("*")).get
    // Number=A INFO slices positionally; Number=1 passes through
    assert(delRec.variant.get.annotation("AC") == "3")
    assert(starRec.variant.get.annotation("AC") == "1")
    assert(starRec.variant.get.annotation("AN") == "4")
    // GT 1/2: each record sees ITS allele as ALT, the other as OTHER_ALT
    assert(delRec.genotypes.head.alleles == Seq("ALT", "OTHER_ALT"))
    assert(starRec.genotypes.head.alleles == Seq("OTHER_ALT", "ALT"))
    // AD: ref depth + the record's own alt depth
    assert(delRec.genotypes.head.alternateReadDepth.contains(5))
    assert(starRec.genotypes.head.alternateReadDepth.contains(3))
    assert(starRec.genotypes.head.referenceReadDepth.contains(12))
    // diploid PL over 3 alleles (00,01,11,02,12,22): keep {REF, a}
    assert(delRec.genotypes.head.genotypeLikelihoods ==
      Seq(50.0, 20.0, 10.0)) // 00,01,11
    assert(starRec.genotypes.head.genotypeLikelihoods ==
      Seq(50.0, 40.0, 35.0)) // 00,02,22
  }

  test("hostile: mixed-ploidy samples in ONE record — haploid G-vector " +
      "slicing and diploid half-calls agree with the converter") {
    // sample s1 is haploid (chrX male convention): GT "2", PL has one
    // entry PER ALLELE and Number=G attrs slice to {REF, a}; sample s2 is
    // a diploid half-call ./1 — the missing allele is NO_CALL, the known
    // allele classifies per record
    val line = "chrX\t500\t.\tA\tC,T\t60\tPASS\tDP=33\t" +
      "GT:PL:GP\t2:9,8,7:0.7,0.2,0.1\t./1:50,20,10,40,15,35:."
    val vcs = VcfIO.parseLine(line, Seq("s1", "s2"))
    assert(vcs.length == 2)
    val cRec = vcs.find(_.variant.get.alternateAllele.contains("C")).get
    val tRec = vcs.find(_.variant.get.alternateAllele.contains("T")).get
    def g(vc: graft.model.VariantContext, s: String) =
      vc.genotypes.find(_.sampleId.contains(s)).get
    // haploid G vector = one entry per allele: keep {REF, a}
    assert(g(cRec, "s1").genotypeLikelihoods == Seq(9.0, 8.0))
    assert(g(tRec, "s1").genotypeLikelihoods == Seq(9.0, 7.0))
    assert(g(cRec, "s1").attributes("GP") == "0.7,0.2")
    assert(g(tRec, "s1").attributes("GP") == "0.7,0.1")
    // haploid allele classification: "2" is OTHER_ALT for C, ALT for T
    assert(g(cRec, "s1").alleles == Seq("OTHER_ALT"))
    assert(g(tRec, "s1").alleles == Seq("ALT"))
    // diploid half-call: NO_CALL survives, known allele classifies
    assert(g(cRec, "s2").alleles == Seq("NO_CALL", "ALT"))
    assert(g(tRec, "s2").alleles == Seq("NO_CALL", "OTHER_ALT"))
    // diploid PL slices normally alongside the haploid sample
    assert(g(cRec, "s2").genotypeLikelihoods == Seq(50.0, 20.0, 10.0))
    assert(g(tRec, "s2").genotypeLikelihoods == Seq(50.0, 40.0, 35.0))
  }

  test("mixed GL/PL sources at one site: PL is emitted and GL-sourced " +
      "log10 floats convert to phred ints (never floats under PL)") {
    val variant = Variant(referenceName = Some("chr1"), start = Some(99L),
      end = Some(100L), referenceAllele = Some("A"),
      alternateAllele = Some("T"))
    val gPl = Genotype(referenceName = Some("chr1"), start = Some(99L),
      end = Some(100L), sampleId = Some("s1"),
      alleles = Seq("REF", "ALT"),
      genotypeLikelihoods = Seq(40.0, 0.0, 55.0),
      likelihoodsPhred = Some(true))
    val gGl = Genotype(referenceName = Some("chr1"), start = Some(99L),
      end = Some(100L), sampleId = Some("s2"),
      alleles = Seq("REF", "ALT"),
      genotypeLikelihoods = Seq(-4.0, 0.0, -5.55),
      likelihoodsPhred = Some(false))
    val line = VcfIO.toVcfLine(
      VariantContext(Some("chr1"), Some(99L), Some(100L), Some(variant),
        Seq(gPl, gGl)), Seq("s1", "s2")).split("\t")
    val fmt = line(8).split(":")
    assert(fmt.contains("PL") && !fmt.contains("GL"),
      "mixed-source site must emit the strictest key (PL)")
    val pl = fmt.indexOf("PL")
    assert(line(9).split(":")(pl) == "40,0,55",
      "PL-sourced values pass through unchanged")
    assert(line(10).split(":")(pl) == "40,0,56",
      "GL-sourced values must convert via round(-10*GL)")
    // all-GL site still round-trips under GL with floats intact
    val allGl = VcfIO.toVcfLine(
      VariantContext(Some("chr1"), Some(99L), Some(100L), Some(variant),
        Seq(gGl)), Seq("s2")).split("\t")
    assert(allGl(8).split(":").contains("GL"))
    assert(allGl(9).split(":")(allGl(8).split(":").indexOf("GL")) ==
      "-4,0,-5.55")
  }

  test("failed FILTER with no named filters emits '.', not FAIL") {
    val vc = VariantContext(Some("chr1"), Some(99L), Some(100L),
      Some(Variant(referenceName = Some("chr1"), start = Some(99L),
        end = Some(100L), referenceAllele = Some("A"),
        alternateAllele = Some("T"), filtersApplied = Some(true),
        filtersPassed = Some(false))), Seq.empty)
    val cols = VcfIO.toVcfLine(vc, Seq.empty).split("\t")
    assert(cols(6) == ".")
    val named = VcfIO.toVcfLine(
      VariantContext(Some("chr1"), Some(99L), Some(100L),
        Some(vc.variant.get.copy(filtersFailed = Seq("q10"))), Seq.empty),
      Seq.empty).split("\t")
    assert(named(6) == "q10")
  }

  test("bgzipped BED reads through the splittable path with extension dispatch") {
    import spark.implicits._
    val lines = (0 until 3000).map(i =>
      s"chr${i % 2 + 1}\t${i * 10}\t${i * 10 + 5}\tf$i\t${i % 1000}\t+")
    val path = tmpDir() + "/feat.bed.gz"
    BgzfText.writeLines(spark.createDataset(lines), path, asSingleFile = true)
    val feats = FeatureIO.readFeatures(spark, path).collect()
    assert(feats.length == 3000)
    assert(feats.flatMap(_.name).toSet.contains("f2999"))
    assert(feats.forall(f => f.start.exists(_ % 10 == 0)))
  }

  test(".fai index: build, persist, and random-access extract") {
    val chr1 = (0 until 237).map(i => "ACGT"((i * 7) % 4)).mkString
    val chr2 = (0 until 91).map(i => "TGCA"((i * 3) % 4)).mkString
    val fasta = ">chr1 desc here\n" + chr1.grouped(60).mkString("\n") +
      "\n>chr2\n" + chr2.grouped(60).mkString("\n") + "\n"
    val path = fixture("ref.fa", fasta)
    val idx = Fai.open(spark, path)
    assert(new java.io.File(path + ".fai").exists())
    assert(idx.entries.map(e => (e.name, e.length)) ==
      Seq(("chr1", 237L), ("chr2", 91L)))
    // line-boundary-crossing, start, end, and cross-contig probes
    assert(idx.extract(ReferenceRegion("chr1", 0, 10)) == chr1.substring(0, 10))
    assert(idx.extract(ReferenceRegion("chr1", 55, 130)) == chr1.substring(55, 130))
    assert(idx.extract(ReferenceRegion("chr1", 230, 237)) == chr1.substring(230))
    assert(idx.extract(ReferenceRegion("chr2", 59, 62)) == chr2.substring(59, 62))
    // reopen from the persisted .fai (parse path, not build path)
    val idx2 = Fai.open(spark, path)
    assert(idx2.extract(ReferenceRegion("chr1", 100, 160)) ==
      chr1.substring(100, 160))
  }

  test("paired FASTQ save splits mates, restores sequenced orientation") {
    import org.apache.spark.sql.Encoders
    implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
      Encoders.product[Alignment]
    def mate(name: String, frag: Int, seq: String, neg: Boolean) =
      Alignment(readName = Some(name), readInFragment = Some(frag),
        sequence = Some(seq), qualityScores = Some("ABCD"),
        readNegativeStrand = Some(neg), readPaired = Some(true))
    val reads = spark.createDataset(Seq(
      mate("p1", 0, "ACGT", neg = false),
      mate("p1", 1, "TTGG", neg = true), // stored revcomp of sequenced CCAA
      mate("p2", 0, "GGGG", neg = false),
      mate("p2", 1, "CCCC", neg = false)))
    val d1 = tmpDir() + "/r1"; val d2 = tmpDir() + "/r2"
    SequenceIO.writePairedFastq(reads, d1, d2)
    val r1 = spark.read.textFile(d1).collect().mkString("\n")
    val r2 = spark.read.textFile(d2).collect().mkString("\n")
    assert(r1.contains("@p1/1\nACGT\n+\nABCD"))
    assert(r2.contains("@p1/2\nCCAA\n+\nDCBA")) // revcomp + reversed quals
    assert(r2.contains("@p2/2\nCCCC"))
    // strict validation rejects missing mates
    val broken = spark.createDataset(Seq(mate("q", 0, "AAAA", neg = false)))
    intercept[IllegalArgumentException] {
      SequenceIO.writePairedFastq(broken, tmpDir() + "/x1", tmpDir() + "/x2")
    }
  }

  test("VariantAnnotations typed INFO access, Scala and Column") {
    import graft.api.VariantAnnotations._
    val v = Variant(annotation = Map(
      "AC" -> "3,1", "AF" -> "0.25,0.05", "AN" -> "12", "DP" -> "88",
      "END" -> "1234", "DB" -> "true"))
    assert(alleleCount(v).contains(3))
    assert(alleleFrequency(v).contains(0.25))
    assert(totalAlleles(v).contains(12))
    assert(combinedDepth(v).contains(88))
    assert(endPosition(v).contains(1234L))
    assert(isDbSnp(v) && !isSomatic(v))

    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Map("AC" -> "3,1", "DP" -> "88")).toDF("annotation")
    val row = df.select(
      alleleCountCol(col("annotation")).as("ac"),
      combinedDepthCol(col("annotation")).as("dp"),
      isDbSnpCol(col("annotation")).as("db")).collect().head
    assert(row.getInt(0) == 3 && row.getInt(1) == 88 && !row.getBoolean(2))
  }
}
