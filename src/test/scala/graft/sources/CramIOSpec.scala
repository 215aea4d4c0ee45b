package graft.sources

import graft.SparkSpec
import graft.core.GenomicDataset
import graft.model._
import org.apache.spark.sql.Encoders

class CramIOSpec extends SparkSpec {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
    Encoders.product[Alignment]

  private val meta = GenomicMetadata(
    sequences = SequenceDictionary(Seq(
      SequenceRecord("chr1", 10000, index = Some(0)),
      SequenceRecord("chr2", 5000, index = Some(1)))),
    readGroups = ReadGroupDictionary(Seq(
      ReadGroup(sampleId = "s1", id = "rg1", library = Some("lib1")))))

  test("itf8 / ltf8 round trips incl. negatives") {
    val bos = new java.io.ByteArrayOutputStream()
    val vals = Seq(0, 1, 127, 128, 300, 1 << 14, (1 << 21) + 5, (1 << 28) + 9,
      Int.MaxValue, -1, -2)
    vals.foreach(CramIO.writeItf8(bos, _))
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    vals.foreach(v => assert(CramIO.readItf8(in) == v, s"itf8 $v"))
    val bos2 = new java.io.ByteArrayOutputStream()
    val lvals = Seq(0L, 5L, 1L << 40, Long.MaxValue, -1L)
    lvals.foreach(CramIO.writeLtf8(bos2, _))
    val in2 = new java.io.ByteArrayInputStream(bos2.toByteArray)
    lvals.foreach(v => assert(CramIO.readLtf8(in2) == v, s"ltf8 $v"))
  }

  private def rec(
      name: String, ref: Option[String], start: Option[Long],
      cigar: Option[String], seq: String, quals: String,
      attrs: Map[String, String] = Map.empty,
      paired: Boolean = false, neg: Boolean = false): Alignment =
    Alignment(
      readName = Some(name), referenceName = ref, start = start,
      end = for (s <- start; c <- cigar) yield s + Cigar.referenceLength(c),
      cigar = cigar, sequence = Some(seq), qualityScores = Some(quals),
      mappingQuality = if (ref.isDefined) Some(37) else None,
      readMapped = Some(ref.isDefined), readPaired = Some(paired),
      readNegativeStrand = Some(neg), mateNegativeStrand = Some(false),
      mateMapped = Some(paired),
      mateReferenceName = if (paired) ref else None,
      mateAlignmentStart = if (paired) start.map(_ + 100) else None,
      insertSize = if (paired) Some(136L) else None,
      readInFragment = Some(0), primaryAlignment = Some(true),
      secondaryAlignment = Some(false), supplementaryAlignment = Some(false),
      duplicateRead = Some(false), failedVendorQualityChecks = Some(false),
      readGroupId = Some("rg1"), attributes = attrs)

  private def key(a: Alignment) =
    (a.readName, a.referenceName, a.start, a.end, a.cigar, a.sequence,
      a.qualityScores, a.mappingQuality, a.readMapped, a.readPaired,
      a.readNegativeStrand, a.duplicateRead, a.readGroupId,
      a.mateReferenceName, a.mateAlignmentStart, a.insertSize, a.attributes)

  test("CRAM round trip: cigars, clips, indels, tags, unmapped") {
    val reads = Seq(
      rec("r1", Some("chr1"), Some(100L), Some("36M"),
        "ACGTACGTACGTACGTACGTACGTACGTACGTACGT", "I" * 36,
        attrs = Map("NM" -> "i:0", "RG" -> "Z:rg1")),
      rec("r2", Some("chr1"), Some(200L), Some("5S26M5S"),
        "ACGTACGTACGTACGTACGTACGTACGTACGTACGT", "F" * 36,
        attrs = Map("MD" -> "Z:26", "XS" -> "A:+", "XF" -> "f:1.5")),
      rec("r3", Some("chr2"), Some(300L), Some("10M4D10M2I14M"),
        "ACGTACGTACGTACGTACGTACGTACGTACGTACGT", "5" * 36, paired = true),
      rec("r4", Some("chr2"), Some(400L), Some("8M100N28M"),
        "ACGTACGTACGTACGTACGTACGTACGTACGTACGT", "#" * 36, neg = true),
      rec("u1", None, None, None, "GGGGCCCC", "IIIIIIII"))
    val path = tmpDir() + "/t.cram"
    CramIO.write(GenomicDataset(spark.createDataset(reads), meta), path)
    val back = CramIO.read(spark, path)
    assert(back.meta.sequences.records.map(_.name) == Seq("chr1", "chr2"))
    val got = back.ds.collect()
    assert(got.length == reads.length)
    assert(got.map(key).toSet == reads.map(key).toSet)
  }

  test("CRAM multi-container files parallelize per container") {
    val rnd = new scala.util.Random(31)
    val bases = "ACGT"
    val many = (0 until 5000).map { i =>
      rec(s"m$i", Some("chr1"), Some((i % 9000).toLong), Some("20M"),
        Array.fill(20)(bases(rnd.nextInt(4))).mkString, "I" * 20)
    }
    val path = tmpDir() + "/many.cram"
    CramIO.write(GenomicDataset(spark.createDataset(many), meta), path,
      recordsPerContainer = 512)
    val back = CramIO.read(spark, path)
    val got = back.ds.collect()
    assert(got.length == 5000)
    assert(got.map(_.readName.get).sorted.sameElements(
      many.map(_.readName.get).sorted))
    // several containers -> several partitions
    assert(back.ds.rdd.getNumPartitions >= 5)
  }

  test("crai-indexed region query decodes only overlapping containers") {
    val rnd = new scala.util.Random(37)
    val bases = "ACGT"
    // coordinate-sorted so containers have tight spans
    val many = (0 until 6000).map { i =>
      val s = (i.toLong * 3) % 9000
      (s, rec(s"i$i", Some("chr1"), Some(s), Some("20M"),
        Array.fill(20)(bases(rnd.nextInt(4))).mkString, "I" * 20))
    }.sortBy(_._1).map(_._2)
    val path = tmpDir() + "/idx.cram"
    CramIO.writeIndexed(GenomicDataset(spark.createDataset(many), meta), path,
      recordsPerContainer = 500)
    assert(new java.io.File(path + ".crai").exists())

    val regions = Seq(ReferenceRegion("chr1", 4000L, 4200L))
    val got = CramIO.readIndexed(spark, path, regions)
    val gotNames = got.ds.collect().map(_.readName.get).sorted
    val expected = many.filter(r => regions.exists(rr =>
        r.start.exists(_ < rr.end) && r.end.exists(_ > rr.start)))
      .map(_.readName.get).sorted
    assert(expected.nonEmpty)
    assert(gotNames.sameElements(expected))
    // pruning: far fewer containers decoded than exist (12 total)
    assert(got.ds.rdd.getNumPartitions < 6,
      s"expected pruned containers, got ${got.ds.rdd.getNumPartitions}")
  }

  test("CRAM fuzz: random cigars, hard clips, padding, empty quals survive") {
    val rnd = new scala.util.Random(47)
    val bases = "ACGT"
    def randomRead(i: Int): Alignment = {
      // random cigar over read-consuming and ref-consuming ops
      val ops = Seq.newBuilder[(Char, Int)]
      if (rnd.nextBoolean()) ops += (('H', 1 + rnd.nextInt(5)))
      if (rnd.nextBoolean()) ops += (('S', 1 + rnd.nextInt(8)))
      ops += (('M', 10 + rnd.nextInt(30)))
      rnd.nextInt(3) match {
        case 0 => ops += (('D', 1 + rnd.nextInt(6))); ops += (('M', 5 + rnd.nextInt(10)))
        case 1 => ops += (('I', 1 + rnd.nextInt(6))); ops += (('M', 5 + rnd.nextInt(10)))
        case _ => ops += (('N', 20 + rnd.nextInt(50))); ops += (('M', 5 + rnd.nextInt(10)))
      }
      if (rnd.nextBoolean()) ops += (('P', 1 + rnd.nextInt(3)))
      if (rnd.nextBoolean()) ops += (('S', 1 + rnd.nextInt(8)))
      val cig = ops.result()
      val readLen = cig.collect { case (op, l) if "MIS".contains(op) => l }.sum
      val refLen = cig.collect { case (op, l) if "MDN".contains(op) => l }.sum
      val cigar = cig.map { case (op, l) => s"$l$op" }.mkString
      Alignment(readName = Some(s"f$i"), referenceName = Some("chr1"),
        start = Some(i * 200L), end = Some(i * 200L + refLen),
        cigar = Some(cigar),
        sequence = Some(Array.fill(readLen)(bases(rnd.nextInt(4))).mkString),
        qualityScores = Some(Array.fill(readLen)((33 + rnd.nextInt(60)).toChar).mkString),
        mappingQuality = Some(rnd.nextInt(61)),
        readMapped = Some(true), readPaired = Some(rnd.nextBoolean()),
        readNegativeStrand = Some(rnd.nextBoolean()),
        mateNegativeStrand = Some(false),
        primaryAlignment = Some(true), secondaryAlignment = Some(false),
        supplementaryAlignment = Some(false),
        duplicateRead = Some(rnd.nextBoolean()),
        failedVendorQualityChecks = Some(false), mateMapped = Some(false),
        attributes = Map("XI" -> s"i:$i"))
    }
    val reads = (0 until 300).map(randomRead)
    val path = tmpDir() + "/fuzz.cram"
    CramIO.write(GenomicDataset(spark.createDataset(reads), meta), path)
    val back = CramIO.read(spark, path).ds.collect()
      .map(r => r.readName.get -> r).toMap
    assert(back.size == 300)
    reads.foreach { r =>
      val b = back(r.readName.get)
      assert(b.cigar == r.cigar, s"${r.readName}: ${b.cigar} vs ${r.cigar}")
      assert(b.sequence == r.sequence)
      assert(b.qualityScores == r.qualityScores)
      assert(b.start == r.start && b.end == r.end)
      assert(b.attributes.get("XI") == r.attributes.get("XI"))
    }
  }

  test("core-profile CRAM (BETA/HUFFMAN bit encodings) round trips") {
    val rnd = new scala.util.Random(59)
    val bases = "ACGT"
    val reads = (0 until 400).map { i =>
      val cigar = rnd.nextInt(3) match {
        case 0 => "30M"
        case 1 => "5S20M2D5M"
        case _ => "10M3I17M"
      }
      val readLen = Cigar.parse(cigar).collect {
        case e if "MIS=X".contains(e.op) => e.length.toInt }.sum
      rec(s"c$i", Some("chr1"), Some(i * 50L), Some(cigar),
        Array.fill(readLen)(bases(rnd.nextInt(4))).mkString,
        Array.fill(readLen)((33 + rnd.nextInt(40)).toChar).mkString,
        attrs = if (i % 2 == 0) Map("XC" -> s"i:$i") else Map.empty)
    } :+ rec("u", None, None, None, "ACGT", "IIII")
    val path = tmpDir() + "/core.cram"
    CramIO.write(GenomicDataset(spark.createDataset(reads), meta), path,
      coreProfile = true)
    val back = CramIO.read(spark, path).ds.collect()
      .map(r => r.readName.get -> r).toMap
    assert(back.size == reads.length)
    reads.foreach { r =>
      val b = back(r.readName.get)
      assert(b.cigar == r.cigar, s"${r.readName}: ${b.cigar} vs ${r.cigar}")
      assert(b.sequence == r.sequence)
      assert(b.qualityScores == r.qualityScores)
      assert(b.mappingQuality == r.mappingQuality)
      assert(b.attributes.get("XC") == r.attributes.get("XC"))
    }
  }

  test("CRAM compresses smaller than BAM on repetitive data") {
    val reads = (0 until 2000).map(i =>
      rec(s"c$i", Some("chr1"), Some(i.toLong), Some("36M"),
        "ACGTACGTACGTACGTACGTACGTACGTACGTACGT", "I" * 36))
    val gd = GenomicDataset(spark.createDataset(reads), meta)
    val cramPath = tmpDir() + "/c.cram"
    val bamPath = tmpDir() + "/c.bam"
    CramIO.write(gd, cramPath)
    BamIO.write(gd, bamPath, asSingleFile = true)
    val cramSize = new java.io.File(cramPath).length()
    val bamSize = new java.io.File(bamPath).length()
    assert(cramSize < bamSize,
      s"cram=$cramSize should be smaller than bam=$bamSize")
  }
}
