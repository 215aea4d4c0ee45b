package graft.api

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Typed per-dataset filter surface (SURVEY.md §2.3) — every filter in the
  * reference's AlignmentDataset (AD:1805-1920), FeatureDataset
  * (FD:543-762), VariantDataset (VariantDataset.scala:362-476) and
  * GenotypeDataset (GenotypeDataset.scala:468-566), expressed as plain
  * Catalyst column predicates so they push down to parquet scans.
  */
object Filters {

  // --------------------------- alignments ---------------------------------

  implicit class AlignmentFilters(val ds: Dataset[Alignment]) extends AnyVal {
    def filterByMappingQuality(min: Int): Dataset[Alignment] =
      ds.filter(col("mappingQuality") >= min)
    def filterUnalignedReads(): Dataset[Alignment] =
      ds.filter(col("readMapped") === true)
    def filterUnpairedReads(): Dataset[Alignment] =
      ds.filter(col("readPaired") === true)
    def filterDuplicateReads(): Dataset[Alignment] =
      // null-safe: an unset flag means "not a duplicate"
      ds.filter(!(col("duplicateRead") <=> true))
    def filterToPrimaryAlignments(): Dataset[Alignment] =
      ds.filter(col("primaryAlignment") === true)
    def filterToReadGroup(rg: String): Dataset[Alignment] =
      ds.filter(col("readGroupId") === rg)
    def filterToReadGroups(rgs: Seq[String]): Dataset[Alignment] =
      ds.filter(col("readGroupId").isin(rgs: _*))
    def filterToSample(sample: String): Dataset[Alignment] =
      ds.filter(col("readGroupSampleId") === sample)
    def filterToSamples(samples: Seq[String]): Dataset[Alignment] =
      ds.filter(col("readGroupSampleId").isin(samples: _*))
    def filterToReferenceName(name: String): Dataset[Alignment] =
      ds.filter(col("referenceName") === name)
  }

  // ---------------------------- features ----------------------------------

  implicit class FeatureFilters(val ds: Dataset[Feature]) extends AnyVal {
    def filterToFeatureType(t: String): Dataset[Feature] =
      ds.filter(col("featureType") === t)
    def filterToFeatureTypes(ts: Seq[String]): Dataset[Feature] =
      ds.filter(col("featureType").isin(ts: _*))
    def filterToGene(g: String): Dataset[Feature] =
      ds.filter(col("geneId") === g)
    def filterToGenes(gs: Seq[String]): Dataset[Feature] =
      ds.filter(col("geneId").isin(gs: _*))
    def filterToTranscript(t: String): Dataset[Feature] =
      ds.filter(col("transcriptId") === t)
    def filterToExon(e: String): Dataset[Feature] =
      ds.filter(col("exonId") === e)
    def filterByScore(min: Double): Dataset[Feature] =
      ds.filter(col("score") >= min)
    def filterToParent(p: String): Dataset[Feature] =
      ds.filter(array_contains(col("parentIds"), p))
    def filterByAttribute(key: String, value: String): Dataset[Feature] =
      ds.filter(element_at(col("attributes"), key) === value)
    def filterToReferenceName(name: String): Dataset[Feature] =
      ds.filter(col("referenceName") === name)
  }

  // ---------------------------- variants ----------------------------------

  implicit class VariantFilters(val ds: Dataset[Variant]) extends AnyVal {
    def filterToFiltersPassed(): Dataset[Variant] =
      ds.filter(col("filtersPassed") === true)
    def filterByQuality(min: Double): Dataset[Variant] =
      ds.filter(col("quality") >= min)
    def filterSingleNucleotideVariants(): Dataset[Variant] =
      ds.filter(length(col("referenceAllele")) === 1 &&
        length(col("alternateAllele")) === 1)
    def filterMultipleNucleotideVariants(): Dataset[Variant] =
      ds.filter(length(col("referenceAllele")) > 1 &&
        length(col("referenceAllele")) === length(col("alternateAllele")))
    def filterIndels(): Dataset[Variant] =
      ds.filter(length(col("referenceAllele")) =!= length(col("alternateAllele")))
    def filterToReferenceName(name: String): Dataset[Variant] =
      ds.filter(col("referenceName") === name)
  }

  // ---------------------------- genotypes ---------------------------------

  implicit class GenotypeFilters(val ds: Dataset[Genotype]) extends AnyVal {
    def filterByGenotypeQuality(min: Int): Dataset[Genotype] =
      ds.filter(col("genotypeQuality") >= min)
    def filterByReadDepth(min: Int): Dataset[Genotype] =
      ds.filter(col("readDepth") >= min)
    def filterByAlternateReadDepth(min: Int): Dataset[Genotype] =
      ds.filter(col("alternateReadDepth") >= min)
    def filterByReferenceReadDepth(min: Int): Dataset[Genotype] =
      ds.filter(col("referenceReadDepth") >= min)
    def filterToSample(s: String): Dataset[Genotype] =
      ds.filter(col("sampleId") === s)
    def filterToSamples(ss: Seq[String]): Dataset[Genotype] =
      ds.filter(col("sampleId").isin(ss: _*))
    def filterNoCalls(): Dataset[Genotype] =
      ds.filter(!array_contains(col("alleles"), "NO_CALL"))
  }
}
