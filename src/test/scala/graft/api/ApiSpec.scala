package graft.api

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.Encoders

class ApiSpec extends SparkSpec {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] = Encoders.product
  private implicit val featEnc: org.apache.spark.sql.Encoder[Feature] = Encoders.product
  private implicit val gtEnc: org.apache.spark.sql.Encoder[Genotype] = Encoders.product
  private implicit val seqEnc: org.apache.spark.sql.Encoder[Sequence] = Encoders.product

  test("alignment filters push column predicates") {
    import Filters._
    val reads = spark.createDataset(Seq(
      Alignment(readName = Some("a"), mappingQuality = Some(60),
        readMapped = Some(true), duplicateRead = Some(false),
        readGroupId = Some("rg1")),
      Alignment(readName = Some("b"), mappingQuality = Some(10),
        readMapped = Some(true), duplicateRead = Some(true),
        readGroupId = Some("rg2")),
      Alignment(readName = Some("c"), readMapped = Some(false))))
    assert(reads.filterByMappingQuality(30).collect()
      .map(_.readName.get).toSeq == Seq("a"))
    assert(reads.filterUnalignedReads().count() == 2)
    assert(reads.filterDuplicateReads().count() == 2) // removes only b
    assert(reads.filterToReadGroup("rg2").count() == 1)
  }

  test("feature filters incl. attribute and parent") {
    import Filters._
    val feats = spark.createDataset(Seq(
      Feature(featureId = Some("f1"), featureType = Some("gene"),
        geneId = Some("g1"), score = Some(5.0),
        attributes = Map("biotype" -> "protein_coding")),
      Feature(featureId = Some("f2"), featureType = Some("exon"),
        geneId = Some("g1"), parentIds = Seq("t1"), score = Some(1.0))))
    assert(feats.filterToFeatureType("gene").count() == 1)
    assert(feats.filterToGene("g1").count() == 2)
    assert(feats.filterByScore(2.0).count() == 1)
    assert(feats.filterToParent("t1").count() == 1)
    assert(feats.filterByAttribute("biotype", "protein_coding").count() == 1)
  }

  test("genotype no-call filter") {
    import Filters._
    val gts = spark.createDataset(Seq(
      Genotype(sampleId = Some("s1"), alleles = Seq("REF", "ALT")),
      Genotype(sampleId = Some("s2"), alleles = Seq("NO_CALL", "NO_CALL"))))
    assert(gts.filterNoCalls().collect().map(_.sampleId.get).toSeq == Seq("s1"))
  }

  test("sequence <-> slice round trip with merge") {
    val seqs = spark.createDataset(Seq(
      Sequence(name = Some("s1"), sequence = Some("ACGTACGTACGT"),
        length = Some(12L))))
    val slices = Conversions.sequencesToSlices(seqs, maxLength = 5L)
    assert(slices.count() == 3)
    val back = Conversions.slicesToSequences(slices).collect().head
    assert(back.sequence.contains("ACGTACGTACGT"))
  }

  test("extractRegion assembles across slice boundary") {
    val seqs = spark.createDataset(Seq(
      Sequence(name = Some("chr1"), sequence = Some("AAAACCCCGGGGTTTT"),
        length = Some(16L))))
    val slices = Conversions.sequencesToSlices(seqs, maxLength = 4L)
    val got = Conversions.extractRegion(slices, ReferenceRegion("chr1", 2, 10))
      .collect().head
    assert(got._2 == "AACCCCGG")
  }

  test("flankAdjacent stitches neighbor bases") {
    val seqs = spark.createDataset(Seq(
      Sequence(name = Some("chr1"), sequence = Some("AAAACCCCGGGG"),
        length = Some(12L))))
    val slices = Conversions.sequencesToSlices(seqs, maxLength = 4L)
    val flanked = Conversions.flankAdjacent(slices, 2).collect()
      .sortBy(_.index)
    assert(flanked(0).sequence.contains("AAAACC"))       // + next head
    assert(flanked(1).sequence.contains("AACCCCGG"))     // both sides
    assert(flanked(2).sequence.contains("CCGGGG"))       // + prev tail
    assert(flanked(1).start.contains(2L))
  }

  test("genotypes -> variant contexts -> variants") {
    val v = Variant(referenceName = Some("chr1"), start = Some(100L),
      end = Some(101L), referenceAllele = Some("A"), alternateAllele = Some("T"))
    val gts = spark.createDataset(Seq(
      Genotype(referenceName = Some("chr1"), start = Some(100L),
        end = Some(101L), variant = Some(v), sampleId = Some("s1"),
        alleles = Seq("REF", "ALT")),
      Genotype(referenceName = Some("chr1"), start = Some(100L),
        end = Some(101L), variant = Some(v), sampleId = Some("s2"),
        alleles = Seq("ALT", "ALT"))))
    val ctxs = Conversions.genotypesToVariantContexts(gts).collect()
    assert(ctxs.length == 1)
    assert(ctxs.head.genotypes.map(_.sampleId.get) == Seq("s1", "s2"))
    val vars = Conversions.genotypesToVariants(gts).collect()
    assert(vars.length == 1)
  }
}
