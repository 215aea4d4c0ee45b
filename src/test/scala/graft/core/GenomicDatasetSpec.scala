package graft.core

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions.col

class GenomicDatasetSpec extends SparkSpec {

  private implicit val featureEnc: org.apache.spark.sql.Encoder[Feature] =
    Encoders.product[Feature]

  private def features(n: Int): Seq[Feature] =
    (0 until n).map { i =>
      Feature(
        featureId = Some(s"f$i"),
        referenceName = Some("chr" + (i % 3 + 1)),
        start = Some(i * 100L), end = Some(i * 100L + 50L),
        score = Some(i.toDouble))
    }

  private val meta = GenomicMetadata(
    sequences = SequenceDictionary(Seq(
      SequenceRecord("chr1", 100000, index = Some(0)),
      SequenceRecord("chr2", 100000, index = Some(1)),
      SequenceRecord("chr3", 100000, index = Some(2)))),
    samples = Seq(Sample("s1")),
    processingSteps = Seq(ProcessingStep("step1", Some("graft"))))

  test("parquet round-trip preserves records and sidecar metadata") {
    val gd = GenomicDataset(spark.createDataset(features(30)), meta)
    val path = tmpDir() + "/feat.parquet"
    gd.saveAsParquet(path)
    val loaded = GenomicDataset.loadParquet[Feature](spark, path)
    assert(loaded.ds.collect().toSet == gd.ds.collect().toSet)
    assert(loaded.meta.sequences.records.map(_.name) == Seq("chr1", "chr2", "chr3"))
    assert(loaded.meta.samples.map(_.id) == Seq("s1"))
    assert(loaded.meta.processingSteps.map(_.id) == Seq("step1"))
  }

  test("loadParquet backfills columns added after the file was written " +
      "(schema evolution: pre-r15 genotype parquet lacks likelihoodsPhred)") {
    implicit val gtEnc: org.apache.spark.sql.Encoder[Genotype] =
      Encoders.product[Genotype]
    val gts = Seq(
      Genotype(referenceName = Some("chr1"), start = Some(10L),
        end = Some(11L), sampleId = Some("s1"),
        genotypeLikelihoods = Seq(0.0, -1.2, -3.4),
        likelihoodsPhred = Some(false)),
      Genotype(referenceName = Some("chr1"), start = Some(20L),
        end = Some(21L), sampleId = Some("s2")))
    val gd = GenomicDataset(spark.createDataset(gts), meta)
    val path = tmpDir() + "/gt_old.parquet"
    gd.saveAsParquet(path)
    // simulate a file written before the field existed
    val oldPath = tmpDir() + "/gt_pre_r15.parquet"
    spark.read.parquet(path).drop("likelihoodsPhred")
      .write.parquet(oldPath)
    val loaded = GenomicDataset.loadParquet[Genotype](spark, oldPath)
    val rows = loaded.ds.collect().sortBy(_.start)
    assert(rows.length == 2)
    assert(rows.forall(_.likelihoodsPhred.isEmpty),
      "missing column must backfill as None")
    assert(rows.head.genotypeLikelihoods == Seq(0.0, -1.2, -3.4))
  }

  test("partitioned parquet: layout + flag + pruned region load") {
    val gd = GenomicDataset(spark.createDataset(features(30)), meta)
    val path = tmpDir() + "/part.parquet"
    gd.saveAsPartitionedParquet(path, binSize = 1000L)
    // layout has referenceName=…/positionBin=… directories
    val dirs = new java.io.File(path).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("referenceName=")))
    // full load
    val all = GenomicDataset.loadPartitionedParquet[Feature](spark, path)
    assert(all.ds.count() == 30)
    // pruned load: only chr1 rows overlapping [0, 400)
    val pruned = GenomicDataset.loadPartitionedParquet[Feature](
      spark, path, regions = Seq(ReferenceRegion("chr1", 0, 400)))
    val got = pruned.ds.collect().map(_.featureId.get).toSet
    // chr1 features: f0 (0-50), f3 (300-350), f6 (600-650)...
    assert(got == Set("f0", "f3"))
    // write consolidation: one task owns each (referenceName, positionBin)
    // -> exactly one part file per hive partition directory
    val binDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("referenceName="))
      .flatMap(_.listFiles()).filter(_.getName.startsWith("positionBin="))
    assert(binDirs.nonEmpty)
    binDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
    }
  }

  test("filterByOverlappingRegion pushes a plain predicate") {
    val gd = GenomicDataset(spark.createDataset(features(30)), meta)
    val hit = gd.filterByOverlappingRegion(ReferenceRegion("chr2", 100, 200))
    assert(hit.ds.collect().map(_.featureId.get).toSet == Set("f1"))
    val multi = gd.filterByOverlappingRegions(Seq(
      ReferenceRegion("chr2", 100, 200), ReferenceRegion("chr3", 200, 300)))
    assert(multi.ds.collect().map(_.featureId.get).toSet == Set("f1", "f2"))
  }

  test("sortLexicographically orders by (referenceName, start)") {
    val gd = GenomicDataset(spark.createDataset(features(30)), meta)
    val sorted = gd.sortLexicographically(numPartitions = 2)
    val rows = sorted.ds.collect()
    val keys = rows.map(f => (f.referenceName.get, f.start.get))
    assert(keys.sliding(2).forall {
      case Array(a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
      case _ => true
    })
  }

  test("sortedness contract survives save/load and gates the sort fast path") {
    val gd = GenomicDataset(spark.createDataset(features(40)), meta)
    assert(!gd.sorted)
    val s = gd.sortLexicographically()
    assert(s.sorted)
    // already-sorted: fast path returns the same instance, no new plan
    assert(s.sortLexicographically() eq s)
    // order-preserving filter keeps the flag; arbitrary transform clears it
    assert(s.filterByOverlappingRegion(
      ReferenceRegion("chr1", 0L, 100000L)).sorted)
    assert(!s.transform(_.repartition(4)).sorted)

    val path = tmpDir() + "/sorted.parquet"
    s.saveAsParquet(path)
    val loaded = GenomicDataset.loadParquet[Feature](spark, path)
    assert(loaded.sorted, "sorted save must reload as sorted")
    // rows actually come back position-ordered per contig
    val perRef = loaded.ds.collect().toSeq.groupBy(_.referenceName)
    perRef.values.foreach { rs =>
      assert(rs.map(_.start) == rs.map(_.start).sortBy(identity))
    }
    // and an unsorted save does not claim the contract
    val path2 = tmpDir() + "/unsorted.parquet"
    gd.saveAsParquet(path2)
    assert(!GenomicDataset.loadParquet[Feature](spark, path2).sorted)
  }

  test("coordinate-sorted SAM headers declare SO:coordinate") {
    import graft.sources.SamIO
    val lines = SamIO.headerLines(meta, sorted = true)
    assert(lines.head.contains("SO:coordinate"))
    assert(SamIO.headerLines(meta).head.contains("SO:unsorted"))
  }

  test("union merges data and metadata") {
    val gd1 = GenomicDataset(spark.createDataset(features(5)), meta)
    val extra = GenomicMetadata(
      sequences = SequenceDictionary(Seq(SequenceRecord("chr9", 5000))),
      samples = Seq(Sample("s2")))
    val gd2 = GenomicDataset(spark.createDataset(features(5)
      .map(f => f.copy(featureId = f.featureId.map(_ + "x")))), extra)
    val u = gd1.union(gd2)
    assert(u.ds.count() == 10)
    assert(u.meta.sequences.records.map(_.name).contains("chr9"))
    assert(u.meta.samples.map(_.id).toSet == Set("s1", "s2"))
  }

  test("shuffleRegionJoin wires through RegionJoins") {
    val gd1 = GenomicDataset(spark.createDataset(features(10)), meta)
    val gd2 = GenomicDataset(spark.createDataset(features(10)), meta)
    val (joined, m) = gd1.shuffleRegionJoin(gd2)
    // every feature overlaps exactly itself (disjoint intervals per contig)
    assert(joined.count() == 10)
    assert(joined.filter(col("l_featureId") === col("r_featureId")).count() == 10)
    assert(m.sequences.records.length == 3)
  }

  test("pipe through cat keeps records and metadata") {
    import graft.operators.Pipe
    val gd = GenomicDataset(spark.createDataset(features(8)), meta)
    val out = gd.pipe[Feature](Seq("cat"),
      Pipe.BedInFormatter, Pipe.BedOutFormatter)
    assert(out.ds.collect().flatMap(_.start).toSet ==
      gd.ds.collect().flatMap(_.start).toSet)
    assert(out.meta.sequences.records.length == 3)
  }
}
