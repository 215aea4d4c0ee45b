package graft.sources

import graft.SparkSpec
import graft.model._
import java.nio.file.{Files, Paths}
import scala.util.chaining._

class IOSpec extends SparkSpec {

  private def writeFixture(name: String, content: String): String = {
    val p = Paths.get(tmpDir(), name)
    Files.writeString(p, content)
    p.toString
  }

  // ------------------------------- SAM ------------------------------------

  private val samFixture =
    """@HD	VN:1.6	SO:unsorted
      |@SQ	SN:chr1	LN:10000
      |@SQ	SN:chr2	LN:5000
      |@RG	ID:rg1	SM:sample1	LB:lib1
      |@PG	ID:prog1	PN:tester
      |r1	99	chr1	101	60	10M	=	201	110	ACGTACGTAC	IIIIIIIIII	RG:Z:rg1	NM:i:0
      |r1	147	chr1	201	60	10M	=	101	-110	ACGTACGTAC	IIIIIIIIII	RG:Z:rg1
      |r2	0	chr2	51	37	5S5M	*	0	0	ACGTACGTAC	IIIIIFFFFF	RG:Z:rg1
      |r3	4	*	0	0	*	*	0	0	ACGTACGTAC	IIIIIIIIII	RG:Z:rg1
      |""".stripMargin

  test("SAM read: header metadata + record fields") {
    val path = writeFixture("test.sam", samFixture)
    val gd = SamIO.read(spark, path)
    assert(gd.meta.sequences.records.map(_.name) == Seq("chr1", "chr2"))
    assert(gd.meta.readGroups.readGroups.head.library.contains("lib1"))
    assert(gd.meta.processingSteps.head.programName.contains("tester"))
    val reads = gd.ds.collect().sortBy(_.readName)
    assert(reads.length == 4)
    val r1 = reads.filter(_.readName.contains("r1")).minBy(_.start)
    assert(r1.start.contains(100L)) // 0-based
    assert(r1.end.contains(110L))
    assert(r1.readPaired.contains(true) && r1.properPair.contains(true))
    assert(r1.readInFragment.contains(0))
    assert(r1.mateAlignmentStart.contains(200L))
    assert(r1.readGroupId.contains("rg1"))
    val r2 = reads.find(_.readName.contains("r2")).get
    assert(r2.start.contains(50L) && r2.end.contains(55L)) // 5S5M: 5 ref bases
    val r3 = reads.find(_.readName.contains("r3")).get
    assert(r3.readMapped.contains(false) && r3.start.isEmpty)
  }

  test("SAM round-trip preserves records") {
    val path = writeFixture("rt.sam", samFixture)
    val gd = SamIO.read(spark, path)
    val out = tmpDir() + "/out.sam"
    SamIO.write(gd, out, asSingleFile = true)
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.stream().filter(l => l.startsWith("@SQ")).count() == 2)
    val gd2 = SamIO.read(spark, out)
    def key(a: Alignment) = (a.readName, a.start, SamIO.flagOf(a), a.cigar,
      a.sequence, a.qualityScores)
    assert(gd2.ds.collect().map(key).toSet == gd.ds.collect().map(key).toSet)
    assert(gd2.meta.sequences.records.map(_.name) ==
      gd.meta.sequences.records.map(_.name))
  }

  // ------------------------------- BED ------------------------------------

  test("SAM fuzz: random flags/cigars/tags survive SAM -> BAM -> CRAM -> SAM") {
    import org.apache.spark.sql.Encoders
    implicit val ae: org.apache.spark.sql.Encoder[Alignment] = Encoders.product
    val rnd = new scala.util.Random(61)
    val bases = "ACGT"
    val meta = GenomicMetadata(
      sequences = SequenceDictionary(Seq(
        SequenceRecord("chr1", 100000, index = Some(0)),
        SequenceRecord("chr2", 50000, index = Some(1)))),
      readGroups = ReadGroupDictionary(Seq(
        ReadGroup(sampleId = "s", id = "rg1"))))
    val reads = (0 until 150).map { i =>
      val mapped = rnd.nextInt(5) != 0
      val n = 10 + rnd.nextInt(30)
      val cigar = if (rnd.nextBoolean()) s"${n}M"
        else s"${n / 2}M${n - n / 2}S"
      Alignment(
        readName = Some(s"z$i"),
        referenceName = if (mapped) Some(if (rnd.nextBoolean()) "chr1" else "chr2") else None,
        start = if (mapped) Some(rnd.nextInt(40000).toLong) else None,
        end = None, cigar = if (mapped) Some(cigar) else None,
        sequence = Some(Array.fill(n)(bases(rnd.nextInt(4))).mkString),
        qualityScores = Some(Array.fill(n)((33 + rnd.nextInt(60)).toChar).mkString),
        mappingQuality = if (mapped) Some(rnd.nextInt(61)) else None,
        readMapped = Some(mapped),
        readPaired = Some(rnd.nextBoolean()),
        readNegativeStrand = Some(rnd.nextBoolean()),
        mateNegativeStrand = Some(false),
        readInFragment = Some(rnd.nextInt(2)),
        duplicateRead = Some(rnd.nextBoolean()),
        secondaryAlignment = Some(false), supplementaryAlignment = Some(false),
        primaryAlignment = Some(true),
        failedVendorQualityChecks = Some(false), mateMapped = Some(false),
        readGroupId = Some("rg1"),
        attributes = Map("RG" -> "Z:rg1", "XZ" -> s"i:${rnd.nextInt(1000)}"))
        .pipe(r => r.copy(end = for (s <- r.start; c <- r.cigar)
          yield s + Cigar.referenceLength(c)))
    }
    def key(a: Alignment) = (a.readName, a.referenceName, a.start, a.cigar,
      a.sequence, a.qualityScores, a.readNegativeStrand, a.duplicateRead,
      a.attributes.get("XZ"))
    val gd = graft.core.GenomicDataset(spark.createDataset(reads), meta)
    val samPath = tmpDir() + "/fz.sam"
    SamIO.write(gd, samPath, asSingleFile = true)
    val viaSam = SamIO.read(spark, samPath)
    val bamPath = tmpDir() + "/fz.bam"
    BamIO.write(viaSam, bamPath, asSingleFile = true)
    val viaBam = BamIO.read(spark, bamPath)
    val cramPath = tmpDir() + "/fz.cram"
    CramIO.write(viaBam, cramPath, coreProfile = true)
    val viaCram = CramIO.read(spark, cramPath)
    assert(viaCram.ds.collect().map(key).toSet ==
      viaSam.ds.collect().map(key).toSet)
    assert(viaCram.ds.count() == 150)
  }

  test("BED round-trip") {
    val bed = "chr1\t10\t20\tfeat1\t5\t+\nchr2\t0\t100\tfeat2\t0\t-\n"
    val path = writeFixture("t.bed", bed)
    val fs = FeatureIO.readBed(spark, path).collect().sortBy(_.start)
    assert(fs.length == 2)
    assert(fs.head == Feature(referenceName = Some("chr2"), start = Some(0L),
      end = Some(100L), name = Some("feat2"), score = Some(0.0),
      strand = Some("REVERSE")))
    val out = tmpDir() + "/out.bed"
    import spark.implicits._
    FeatureIO.writeBed(spark.createDataset(fs.toSeq), out)
    val rt = FeatureIO.readBed(spark, out).collect().toSet
    assert(rt == fs.toSet)
  }

  // ------------------------------- GFF3 -----------------------------------

  test("GFF3 parse: 1-based closed -> 0-based half-open + attributes") {
    val gff = "chr1\ttest\tgene\t11\t20\t0.5\t+\t.\tID=g1;Name=geneA;custom=x\n" +
      "chr1\ttest\texon\t11\t15\t.\t+\t0\tID=e1;Parent=g1\n"
    val path = writeFixture("t.gff3", gff)
    val fs = FeatureIO.readGff3(spark, path).collect().sortBy(_.featureId)
    val gene = fs.find(_.featureId.contains("g1")).get
    assert(gene.start.contains(10L) && gene.end.contains(20L))
    assert(gene.name.contains("geneA"))
    assert(gene.attributes == Map("custom" -> "x"))
    val exon = fs.find(_.featureId.contains("e1")).get
    assert(exon.parentIds == Seq("g1"))
    assert(exon.phase.contains(0))
    // round trip
    val out = tmpDir() + "/out.gff3"
    import spark.implicits._
    FeatureIO.writeGff3(spark.createDataset(fs.toSeq), out)
    val rt = FeatureIO.readGff3(spark, out).collect()
    assert(rt.map(_.featureId).toSet == fs.map(_.featureId).toSet)
    assert(rt.find(_.featureId.contains("g1")).get.start.contains(10L))
  }

  test("GTF parse quotes and ids") {
    val gtf = "chr1\thavana\tgene\t11\t20\t.\t+\t.\t" +
      """gene_id "G1"; gene_name "alpha"; level "2";""" + "\n"
    val path = writeFixture("t.gtf", gtf)
    val f = FeatureIO.readGtf(spark, path).collect().head
    assert(f.geneId.contains("G1"))
    assert(f.name.contains("alpha"))
    assert(f.attributes.get("level").contains("2"))
  }

  // ------------------------------- FASTA ----------------------------------

  test("FASTA read stitches multi-line records; slices split") {
    val fa = ">seq1 first sequence\nACGTACGTAC\nGGGGCCCC\n>seq2\nTTTT\n"
    val path = writeFixture("t.fa", fa)
    val seqs = SequenceIO.readFasta(spark, path).collect().sortBy(_.name)
    assert(seqs.length == 2)
    assert(seqs.head.name.contains("seq1"))
    assert(seqs.head.description.contains("first sequence"))
    assert(seqs.head.sequence.contains("ACGTACGTACGGGGCCCC"))
    assert(seqs.head.length.contains(18L))
    val slices = SequenceIO.readFastaSlices(spark, path, maxLength = 10L)
      .collect().filter(_.name.contains("seq1")).sortBy(_.index)
    assert(slices.length == 2)
    assert(slices.head.sequence.contains("ACGTACGTAC"))
    assert(slices(1).sequence.contains("GGGGCCCC"))
    assert(slices(1).start.contains(10L) && slices(1).end.contains(18L))
  }

  // ------------------------------- FASTQ ----------------------------------

  test("FASTQ read: 4-line records incl. '@' quality first char") {
    // second record's quality line starts with '@' — the classic trap
    val fq = "@read1\nACGT\n+\nIIII\n@read2\nTTTT\n+\n@III\n"
    val path = writeFixture("t.fq", fq)
    val reads = SequenceIO.readFastq(spark, path).collect().sortBy(_.name)
    assert(reads.length == 2)
    assert(reads.head.name.contains("read1"))
    assert(reads(1).qualityScores.contains("@III"))
    // round trip
    val out = tmpDir() + "/out.fq"
    import spark.implicits._
    SequenceIO.writeFastq(spark.createDataset(reads.toSeq), out)
    val rt = SequenceIO.readFastq(spark, out).collect()
    assert(rt.map(r => (r.name, r.sequence, r.qualityScores)).toSet ==
      reads.map(r => (r.name, r.sequence, r.qualityScores)).toSet)
  }

  // -------------------------------- VCF -----------------------------------

  private val vcfFixture =
    """##fileformat=VCFv4.2
      |##contig=<ID=chr1,length=10000>
      |##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
      |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	s1	s2
      |chr1	101	rs1	A	T	50	PASS	DP=20	GT:GQ:DP	0/1:40:12	1|1:35:8
      |chr1	201	.	G	C,T	.	q10	DP=5	GT	0/2	./.
      |""".stripMargin

  test("VCF parse: sites, multi-allelic split, genotypes") {
    val path = writeFixture("t.vcf", vcfFixture)
    val b = VcfIO.read(spark, path)
    assert(b.samples == Seq("s1", "s2"))
    assert(b.meta.sequences.records.head.name == "chr1")
    val ctxs = b.contexts.collect().sortBy(c => (c.start, c.variant.flatMap(_.alternateAllele)))
    assert(ctxs.length == 3) // 1 biallelic + 2 from the multi-allelic site
    val site1 = ctxs.head
    assert(site1.start.contains(100L))
    val v1 = site1.variant.get
    assert(v1.referenceAllele.contains("A") && v1.alternateAllele.contains("T"))
    assert(v1.filtersPassed.contains(true))
    assert(v1.annotation.get("DP").contains("20"))
    val g1 = site1.genotypes.find(_.sampleId.contains("s1")).get
    assert(g1.alleles == Seq("REF", "ALT"))
    assert(g1.genotypeQuality.contains(40) && g1.readDepth.contains(12))
    val g2 = site1.genotypes.find(_.sampleId.contains("s2")).get
    assert(g2.alleles == Seq("ALT", "ALT") && g2.phased.contains(true))
    // multi-allelic: alt C sees sample1's allele 2 as OTHER_ALT
    val siteC = ctxs.find(_.variant.exists(_.alternateAllele.contains("C"))).get
    assert(siteC.variant.get.splitFromMultiAllelic.contains(true))
    assert(siteC.genotypes.find(_.sampleId.contains("s1")).get.alleles ==
      Seq("REF", "OTHER_ALT"))
    val siteT2 = ctxs.find(c => c.start.contains(200L) &&
      c.variant.exists(_.alternateAllele.contains("T"))).get
    assert(siteT2.genotypes.find(_.sampleId.contains("s1")).get.alleles ==
      Seq("REF", "ALT"))
    assert(siteT2.variant.get.filtersFailed == Seq("q10"))
    assert(siteT2.genotypes.find(_.sampleId.contains("s2")).get.alleles ==
      Seq("NO_CALL", "NO_CALL"))
  }

  test("VCF round-trip preserves biallelic sites") {
    val path = writeFixture("rt.vcf", vcfFixture)
    val b = VcfIO.read(spark, path)
    val out = tmpDir() + "/out.vcf"
    import spark.implicits._
    val biallelic = b.contexts.filter(
      (c: VariantContext) => !c.variant.exists(_.splitFromMultiAllelic.contains(true)))
    VcfIO.write(biallelic, b.meta, b.samples, out, asSingleFile = true)
    val b2 = VcfIO.read(spark, out)
    val c2 = b2.contexts.collect().head
    assert(c2.start.contains(100L))
    assert(c2.variant.get.alternateAllele.contains("T"))
    assert(c2.genotypes.find(_.sampleId.contains("s1")).get.alleles ==
      Seq("REF", "ALT"))
  }
}
