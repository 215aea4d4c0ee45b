package graft.api

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.model._

/** Pairwise type conversions (SURVEY.md §2.8 — the reference's ~60
  * GenomicDatasetConversion implicits, ds/GenomicDatasetConversion.scala,
  * and the typed converters on each dataset). All select/map/explode/
  * groupBy shapes; no custom machinery needed.
  */
object Conversions {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] = Encoders.product
  private implicit val readEnc: org.apache.spark.sql.Encoder[Read] = Encoders.product
  private implicit val seqEnc: org.apache.spark.sql.Encoder[Sequence] = Encoders.product
  private implicit val sliceEnc: org.apache.spark.sql.Encoder[Slice] = Encoders.product
  private implicit val featEnc: org.apache.spark.sql.Encoder[Feature] = Encoders.product
  private implicit val covEnc: org.apache.spark.sql.Encoder[Coverage] = Encoders.product
  private implicit val varEnc: org.apache.spark.sql.Encoder[Variant] = Encoders.product
  private implicit val gtEnc: org.apache.spark.sql.Encoder[Genotype] = Encoders.product
  private implicit val vcEnc: org.apache.spark.sql.Encoder[VariantContext] = Encoders.product

  // ----------------------------- reads ------------------------------------

  /** Alignments → unaligned reads (ReadDataset conversions,
    * ReadDataset.scala:296-363). */
  def alignmentsToReads(ds: Dataset[Alignment]): Dataset[Read] =
    ds.map(a => Read(
      name = a.readName, sequence = a.sequence,
      length = a.sequence.map(_.length.toLong),
      qualityScores = a.qualityScores,
      sampleId = a.readGroupSampleId))

  def readsToAlignments(ds: Dataset[Read]): Dataset[Alignment] =
    ds.map(r => Alignment(
      readName = r.name, sequence = r.sequence,
      qualityScores = r.qualityScores, readMapped = Some(false)))

  def readsToSequences(ds: Dataset[Read]): Dataset[Sequence] =
    ds.map(r => Sequence(
      name = r.name, description = r.description, alphabet = r.alphabet,
      sequence = r.sequence, length = r.length, sampleId = r.sampleId))

  // --------------------------- sequences ----------------------------------

  /** Sequence → fixed-width slices (SequenceDataset.slice,
    * SequenceDataset.scala:306-371). */
  def sequencesToSlices(ds: Dataset[Sequence], maxLength: Long = 10000L): Dataset[Slice] =
    ds.flatMap { s =>
      val seq = s.sequence.getOrElse("")
      val total = seq.length.toLong
      val n = math.max(1L, (total + maxLength - 1) / maxLength).toInt
      (0 until n).map { i =>
        val start = i * maxLength
        val end = math.min(total, start + maxLength)
        Slice(name = s.name, description = s.description, alphabet = s.alphabet,
          sequence = Some(seq.substring(start.toInt, end.toInt)),
          start = Some(start), end = Some(end), strand = Some("FORWARD"),
          length = Some(end - start), totalLength = Some(total),
          index = Some(i), slices = Some(n), sampleId = s.sampleId)
      }
    }

  /** Slices → sequences: reassemble by name in index order
    * (SliceDataset.merge, SliceDataset.scala:291-329). */
  def slicesToSequences(ds: Dataset[Slice]): Dataset[Sequence] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.name.getOrElse(""))
      .mapGroups { (name, slices) =>
        val sorted = slices.toSeq.sortBy(_.index.getOrElse(0))
        val seq = sorted.map(_.sequence.getOrElse("")).mkString("")
        val h = sorted.head
        Sequence(name = Some(name), description = h.description,
          alphabet = h.alphabet, sequence = Some(seq),
          length = Some(seq.length.toLong), sampleId = h.sampleId)
      }
  }

  // ---------------------------- features ----------------------------------

  /** Features → coverage (FeatureDataset.toCoverage, FD:302-318). */
  def featuresToCoverage(ds: Dataset[Feature]): Dataset[Coverage] =
    ds.filter(f => f.referenceName.isDefined && f.start.isDefined && f.end.isDefined)
      .map(f => Coverage(f.referenceName.get, f.start.get, f.end.get,
        f.score.getOrElse(0.0)))

  /** Coverage → features (CoverageDataset.toFeatures, CD:144-223). */
  def coverageToFeatures(ds: Dataset[Coverage]): Dataset[Feature] =
    ds.map(c => Feature(
      referenceName = Some(c.referenceName), start = Some(c.start),
      end = Some(c.end), score = Some(c.count)))

  // ---------------------------- variants ----------------------------------

  /** Genotypes → variant contexts: group by site + collect
    * (GenotypeDataset.toVariantContexts, GenotypeDataset.scala:386-447). */
  def genotypesToVariantContexts(ds: Dataset[Genotype]): Dataset[VariantContext] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(g => (
        g.referenceName.getOrElse(""), g.start.getOrElse(-1L),
        g.variant.flatMap(_.referenceAllele).getOrElse(""),
        g.variant.flatMap(_.alternateAllele).getOrElse("")))
      .mapGroups { (_, gs) =>
        val genotypes = gs.toSeq.sortBy(_.sampleId)
        val h = genotypes.head
        VariantContext(h.referenceName, h.start, h.end, h.variant, genotypes)
      }
  }

  /** Genotypes → distinct variants (GenotypeDataset.toVariants(dedupe),
    * GenotypeDataset.scala:408-448). */
  def genotypesToVariants(ds: Dataset[Genotype], dedupe: Boolean = true): Dataset[Variant] = {
    val vs = ds.flatMap(_.variant)
    if (!dedupe) vs
    else vs.dropDuplicates("referenceName", "start", "end",
      "referenceAllele", "alternateAllele")
  }

  def variantContextsToGenotypes(ds: Dataset[VariantContext]): Dataset[Genotype] =
    ds.flatMap(_.genotypes)

  def variantContextsToVariants(ds: Dataset[VariantContext]): Dataset[Variant] =
    ds.flatMap(_.variant)

  def variantsToVariantContexts(ds: Dataset[Variant]): Dataset[VariantContext] =
    ds.map(v => VariantContext(v.referenceName, v.start, v.end, Some(v), Seq.empty))

  // --------------------------- slice algebra ------------------------------

  /** Extract the bases overlapping a region from distributed slices, then
    * assemble per-sequence (SliceDataset.extract/extractRegions,
    * SliceDataset.scala:460-556): filter → trim → sort-concat. */
  def extractRegion(slices: Dataset[Slice], region: ReferenceRegion): Dataset[(String, String)] = {
    import slices.sparkSession.implicits._
    slices
      .filter(s => s.name.contains(region.referenceName) &&
        s.start.exists(_ < region.end) && s.end.exists(_ > region.start))
      .map { s =>
        val ss = s.start.get
        val from = math.max(0L, region.start - ss).toInt
        val to = math.min(s.sequence.get.length.toLong, region.end - ss).toInt
        (s.name.getOrElse(""), ss + from, s.sequence.get.substring(from, to))
      }
      .groupByKey(_._1)
      .mapGroups { (name, parts) =>
        (name, parts.toSeq.sortBy(_._2).map(_._3).mkString(""))
      }
  }

  /** Stitch `flankSize` bases from each neighbor onto every slice so
    * window operations are partition-safe (SliceDataset.flankAdjacent,
    * ds/sequence/FlankSlices.scala:28-92) — a lead/lag window over the
    * per-sequence slice order. */
  def flankAdjacent(slices: Dataset[Slice], flankSize: Int): Dataset[Slice] = {
    import org.apache.spark.sql.expressions.Window
    import slices.sparkSession.implicits._
    val w = Window.partitionBy("name").orderBy("index")
    val df = slices.toDF()
      .withColumn("__prevTail",
        lag(expr(s"substring(sequence, -$flankSize, $flankSize)"), 1).over(w))
      .withColumn("__nextHead",
        lead(expr(s"substring(sequence, 1, $flankSize)"), 1).over(w))
    df.as[FlankedSliceRow].map { row =>
      val s = row.toSlice
      val prev = Option(row.__prevTail).getOrElse("")
      val next = Option(row.__nextHead).getOrElse("")
      s.copy(
        sequence = s.sequence.map(b => prev + b + next),
        start = s.start.map(_ - prev.length),
        end = s.end.map(_ + next.length))
    }
  }

  private implicit val flankEnc: org.apache.spark.sql.Encoder[FlankedSliceRow] =
    Encoders.product
}

/** Row mirror for [[Conversions.flankAdjacent]]'s windowed projection. */
private[api] case class FlankedSliceRow(
    name: Option[String], description: Option[String], alphabet: Option[String],
    sequence: Option[String], start: Option[Long], end: Option[Long],
    strand: Option[String], length: Option[Long], totalLength: Option[Long],
    index: Option[Int], slices: Option[Int],
    attributes: Map[String, String], sampleId: Option[String],
    __prevTail: String, __nextHead: String) {
  def toSlice: Slice = Slice(name, description, alphabet, sequence, start,
    end, strand, length, totalLength, index, slices, attributes, sampleId)
}
