package graft.operators

import graft.SparkSpec
import graft.functions.GenomicFunctions
import graft.model._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions.col

class ExtraOpsSpec extends SparkSpec {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
    Encoders.product[Alignment]

  test("leftNormalizeCigar slides insertions through repeats") {
    // read AAAATAAA: 4M1I3M with I='T' at pos 4; preceding A != T: no shift
    assert(GenomicFunctions.leftNormalizeCigar("AAAATAAA", "4M1I3M") == "4M1I3M")
    // read AAAAAAA with insertion of A: homopolymer — slides left
    // 4M1I2M: ins base read(4)='A' == read(3)='A' -> shift until M exhausts
    assert(GenomicFunctions.leftNormalizeCigar("AAAAAAA", "4M1I2M") == "1M1I5M")
    // deletion in homopolymer slides too
    assert(GenomicFunctions.leftNormalizeCigar("AAAAAA", "4M2D2M") == "1M2D5M")
    // no M after indel: untouched
    assert(GenomicFunctions.leftNormalizeCigar("AAAA", "4M1I") == "4M1I")
  }

  test("leftNormalizeIndels dataset op records originalCigar") {
    val r = Alignment(readName = Some("a"), sequence = Some("AAAAAAA"),
      cigar = Some("4M1I2M"), readMapped = Some(true))
    val out = AlignmentOps.leftNormalizeIndels(spark.createDataset(Seq(r)))
      .collect().head
    assert(out.cigar.contains("1M1I5M"))
    assert(out.originalCigar.contains("4M1I2M"))
  }

  test("reassembleReadPairs restores mate fields") {
    val r1 = Alignment(readName = Some("p"), referenceName = Some("chr1"),
      start = Some(100L), readInFragment = Some(0), readMapped = Some(true),
      readNegativeStrand = Some(false))
    val r2 = Alignment(readName = Some("p"), referenceName = Some("chr1"),
      start = Some(300L), readInFragment = Some(1), readMapped = Some(true),
      readNegativeStrand = Some(true))
    val lone = Alignment(readName = Some("q"), readInFragment = Some(0),
      readMapped = Some(false))
    val out = AlignmentOps.reassembleReadPairs(
      spark.createDataset(Seq(r1, r2, lone))).collect()
    val p1 = out.find(a => a.readName.contains("p") && a.readInFragment.contains(0)).get
    assert(p1.mateAlignmentStart.contains(300L))
    assert(p1.mateNegativeStrand.contains(true))
    val p2 = out.find(a => a.readName.contains("p") && a.readInFragment.contains(1)).get
    assert(p2.mateAlignmentStart.contains(100L))
    val q = out.find(_.readName.contains("q")).get
    assert(q.mateAlignmentStart.isEmpty)
  }

  test("sampleCoverage keeps bin-aligned starts") {
    import spark.implicits._
    val cov = Seq(("chr1", 0L, 1L, 1L), ("chr1", 5L, 6L, 1L),
      ("chr1", 10L, 11L, 1L)).toDF("referenceName", "start", "end", "count")
    val s = CoverageOps.sampleCoverage(cov, 10L).collect().map(_.getLong(1))
    assert(s.toSet == Set(0L, 10L))
  }

  test("pipe FASTQ formatter pair round-trips through cat") {
    implicit val re: org.apache.spark.sql.Encoder[Read] = Encoders.product[Read]
    val reads = spark.createDataset(Seq(
      Read(name = Some("r1"), sequence = Some("ACGT"),
        length = Some(4L), qualityScores = Some("IIII")),
      Read(name = Some("r2"), sequence = Some("TTTT"),
        length = Some(4L), qualityScores = Some("@@@@"))))
    val out = Pipe.pipe(reads, Seq("cat"),
      Pipe.FastqInFormatter, Pipe.FastqOutFormatter)
    assert(out.collect().map(r => (r.name, r.sequence, r.qualityScores)).toSet ==
      reads.collect().map(r => (r.name, r.sequence, r.qualityScores)).toSet)
  }

  test("pipeBinned: flanked copies feed context but outputs dedup exactly") {
    implicit val fe: org.apache.spark.sql.Encoder[Feature] = Encoders.product[Feature]
    // features spaced so several sit within the flank of a bin boundary
    val feats = (0 until 40).map(i =>
      Feature(referenceName = Some("chr1"), start = Some(i * 100L),
        end = Some(i * 100L + 50L), name = Some(s"f$i")))
    val out = Pipe.pipeBinned(
      spark.createDataset(feats), Seq("cat"),
      Pipe.BedInFormatter, Pipe.BedOutFormatter,
      regionOf = (f: Feature) => (f.referenceName.get, f.start.get, f.end.get),
      startOf = (f: Feature) => (f.referenceName.get, f.start.get),
      binSize = 1000L, flank = 300L)
    val got = out.collect()
    // every record exactly once despite flank replication
    assert(got.length == 40)
    assert(got.map(_.start.get).toSet == feats.map(_.start.get).toSet)
  }

  test("pipe VCF formatter pair round-trips through cat") {
    implicit val ve: org.apache.spark.sql.Encoder[VariantContext] =
      Encoders.product[VariantContext]
    val vc = VariantContext(Some("chr1"), Some(100L), Some(101L),
      Some(Variant(Some("chr1"), Some(100L), Some(101L),
        referenceAllele = Some("A"), alternateAllele = Some("G"),
        filtersApplied = Some(true), filtersPassed = Some(true))),
      Seq(Genotype(Some("chr1"), Some(100L), Some(101L),
        sampleId = Some("s1"), alleles = Seq("REF", "ALT"))))
    val out = Pipe.pipe(spark.createDataset(Seq(vc)), Seq("cat"),
      new Pipe.VcfInFormatter(Seq("s1")), Pipe.VcfOutFormatter)
    val got = out.collect().head
    assert(got.start.contains(100L))
    assert(got.variant.get.alternateAllele.contains("G"))
    assert(got.genotypes.head.alleles == Seq("REF", "ALT"))
  }

  private def pairedFragment(
      name: String, seq1: String, q1: String, seq2: String, q2: String,
      neg2: Boolean = false) = Fragment(
    name = Some(name),
    alignments = Seq(
      Alignment(readName = Some(name), sequence = Some(seq1),
        qualityScores = Some(q1), readPaired = Some(true),
        readInFragment = Some(0)),
      Alignment(readName = Some(name), sequence = Some(seq2),
        qualityScores = Some(q2), readPaired = Some(true),
        readInFragment = Some(1), readNegativeStrand = Some(neg2))))

  test("tab5 formatter: paired one-line, unpaired three-field, revcomp on -") {
    val paired = pairedFragment("p1/1", "ACGT", "IIII", "GGCC", "12@4", neg2 = true)
    // negative-strand read 2: sequence revcomp'd, quality reversed
    assert(Pipe.Tab5InFormatter.formatAll(paired).toSeq ==
      Seq("p1\tACGT\tIIII\tGGCC\t4@21"))
    val unpaired = Fragment(name = Some("u1"), alignments = Seq(
      Alignment(readName = Some("u1"), sequence = Some("TTAA"),
        qualityScores = None)))
    // unknown quality -> B-run of read length
    assert(Pipe.Tab5InFormatter.formatAll(unpaired).toSeq ==
      Seq("u1\tTTAA\tBBBB"))
    assert(Pipe.Tab5InFormatter.formatAll(Fragment(name = Some("e"))).isEmpty)
  }

  test("tab6 formatter keeps both names and optional suffixes") {
    val paired = pairedFragment("p2", "ACGT", "IIII", "CCGG", "FFFF")
    assert(new Pipe.Tab6InFormatter().formatAll(paired).toSeq ==
      Seq("p2\tACGT\tIIII\tp2\tCCGG\tFFFF"))
    assert(new Pipe.Tab6InFormatter(writeSuffixes = true).formatAll(paired).toSeq ==
      Seq("p2/1\tACGT\tIIII\tp2/2\tCCGG\tFFFF"))
  }

  test("interleaved FASTQ formatter emits read1 then read2, drops unpaired") {
    val paired = pairedFragment("p3", "ACGT", "IIII", "CCGG", "FFFF")
    assert(new Pipe.InterleavedFastqInFormatter(writeSuffixes = true)
      .formatAll(paired).toSeq ==
      Seq("@p3/1", "ACGT", "+", "IIII", "@p3/2", "CCGG", "+", "FFFF"))
    // order restored when alignments arrive second-first
    val swapped = paired.copy(alignments = paired.alignments.reverse)
    assert(new Pipe.InterleavedFastqInFormatter()
      .formatAll(swapped).toSeq.head == "@p3")
    val unpaired = Fragment(name = Some("u2"), alignments = Seq(
      Alignment(readName = Some("u2"), sequence = Some("AC"),
        qualityScores = Some("II"))))
    assert(new Pipe.InterleavedFastqInFormatter().formatAll(unpaired).isEmpty)
  }

  test("tab6 fragments round-trip through cat as text") {
    implicit val fre: org.apache.spark.sql.Encoder[Fragment] =
      Encoders.product[Fragment]
    implicit val se: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    val frags = spark.createDataset(Seq(
      pairedFragment("f1", "ACGT", "IIII", "CCGG", "FFFF"),
      pairedFragment("f2", "TTTT", "@@@@", "AAAA", "HHHH")))
    val out = Pipe.pipe(frags, Seq("cat"),
      new Pipe.Tab6InFormatter(), Pipe.TextOutFormatter)
    assert(out.collect().toSet == Set(
      "f1\tACGT\tIIII\tf1\tCCGG\tFFFF",
      "f2\tTTTT\t@@@@\tf2\tAAAA\tHHHH"))
  }

  test("asofJoin picks the latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq( // (user, lid, t)
      (1L, 10L, 100L), (1L, 11L, 205L), (1L, 12L, 50L),
      (2L, 20L, 100L)) // user 2 has no views at all
      .toDF("u", "lid", "t")
    val right = Seq( // (user, rid, t, v) — two rows tie at t=200
      (1L, 100L, 90L, 1.0), (1L, 101L, 200L, 2.0), (1L, 102L, 200L, 3.0),
      (1L, 103L, 100L, 4.0), // exactly simultaneous with lid=10
      (3L, 300L, 10L, 5.0))
      .toDF("u", "rid", "t", "v")
    val got = Sessionize.asofJoin(left, right, Seq("u"), "t", "t",
        Seq("rid", "v"), rightTieBreak = "rid")
      .select("u", "lid", "asof_rid")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      (1L, 10L, 103L), // equal-time right row IS matched (103 beats 90)
      (1L, 11L, 102L), // t=200 tie -> max tieBreak wins
      (1L, 12L, -1L),  // nothing at or before t=50
      (2L, 20L, -1L))) // no right rows for the key
  }

  test("asofJoin agrees with brute force on random data; single shuffle plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    // small time range forces many collisions (incl. left==right times)
    val lRows = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(40).toLong))
    val rRows = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, 1000L + i, rnd.nextInt(40).toLong))
    val left = lRows.toDF("u", "lid", "t")
    val right = rRows.toDF("u", "rid", "t")
    val out = Sessionize.asofJoin(left, right, Seq("u"), "t", "t",
      Seq("rid"), rightTieBreak = "rid")
    val got = out.select("lid", "asof_rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    lRows.foreach { case (u, lid, t) =>
      val expect = rRows.filter(r => r._1 == u && r._3 <= t)
        .sortBy(r => (r._3, r._2)).lastOption.map(_._2).getOrElse(-1L)
      assert(got(lid) == expect, s"lid=$lid")
    }
    // the union-carry composition pays ONE exchange (the key hash), not
    // one per side plus a join exchange
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single shuffle:\n${plan.take(1200)}")
  }

  test("funnelStages: strict order, gap cutoff, dropouts") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes a->b->c in order
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // user 2: b before a only -> drops at stage 2
      (2L, "b", 5L), (2L, "a", 10L), (2L, "c", 4L),
      // user 3: b exactly at a's time -> NOT strictly after, drops
      (3L, "a", 10L), (3L, "b", 10L),
      // user 4: b too late for the gap
      (4L, "a", 10L), (4L, "b", 200L), (4L, "c", 210L))
      .toDF("u", "et", "ms")
    val stages = Sessionize.funnelStages(ev, "u", "et", "ms",
      Seq("a", "b", "c"), maxGap = Some(50L))
    def users(i: Int) = stages(i).select("u").collect().map(_.getLong(0)).toSet
    assert(users(0) == Set(1L, 2L, 3L, 4L))
    assert(users(1) == Set(1L)) // 2: no b after a; 3: tie; 4: gap
    assert(users(2) == Set(1L))
    // the completed-stage row carries all step times
    val r = stages(2).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((10L, 20L, 30L)))

    val counts = Sessionize.funnelCounts(ev, "u", "et", "ms",
        Seq("a", "b", "c"), maxGap = Some(50L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("1_a" -> 4L, "2_b" -> 1L, "3_c" -> 1L))
  }
}
