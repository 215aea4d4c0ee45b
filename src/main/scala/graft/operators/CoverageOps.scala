package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage / interval aggregation operators (SURVEY.md §2.5).
  *
  * Inputs expose `referenceName: string, start: long, end: long` (half-open)
  * plus operator-specific value columns. Everything here is declarative
  * DataFrame algebra: explode+hashAgg for depth, window sessionization for
  * run-length collapse — no driver collects, scale-safe by construction.
  */
object CoverageOps {

  /** Per-base depth of coverage: explode each interval to its positions and
    * count. Reference: AlignmentDataset.toCoverage (AlignmentDataset.scala:
    * 529-556) — already a DataFrame op there; identical shape here.
    * Partial (map-side) aggregation is automatic via hash agg. */
  def toCoverage(intervals: DataFrame): DataFrame =
    intervals
      .select(col("referenceName"),
        explode(sequence(col("start"), col("end") - 1)).as("pos"))
      .groupBy("referenceName", "pos")
      .agg(count(lit(1)).as("count"))
      .select(col("referenceName"), col("pos").as("start"),
        (col("pos") + 1).as("end"), col("count"))

  /** Mean coverage per fixed-size bin.
    * Reference: CoverageDataset.aggregatedCoverage (CoverageDataset.scala:
    * 420-446). Count-weighted across the bases each record covers. */
  def aggregatedCoverage(coverage: DataFrame, bpPerBin: Long): DataFrame =
    coverage
      .select(col("referenceName"),
        explode(sequence(col("start"), col("end") - 1)).as("pos"),
        col("count"))
      .groupBy(col("referenceName"),
        ((col("pos") / bpPerBin).cast("long") * bpPerBin).as("binStart"))
      .agg(sum(col("count")).as("totalCount"), count(lit(1)).as("nBases"))

  /** First-base-per-bin coverage sample (CoverageDataset.coverage(bpPerBin),
    * CoverageDataset.scala:382-393): keep records starting on a bin
    * boundary. A filter, not an aggregation. */
  def sampleCoverage(coverage: DataFrame, bpPerBin: Long): DataFrame =
    if (bpPerBin <= 1) coverage
    else coverage.filter(col("start") % bpPerBin === 0)

  /** Run-length merge of adjacent intervals with equal `count` — the
    * gaps-and-islands / sessionization pattern.
    * Reference: CoverageDataset.collapse (CoverageDataset.scala:300-348),
    * which does a sorted per-partition scan; here a window `lag` + running
    * group id, which range-partitions by (referenceName) and never needs the
    * reference's partition-boundary repair pass. */
  def collapse(coverage: DataFrame): DataFrame = {
    val w = Window.partitionBy("referenceName").orderBy("start", "end")
    coverage
      .withColumn("__newGrp",
        when(col("start") <= coalesce(lag("end", 1).over(w), lit(Long.MinValue)) &&
          col("count") === coalesce(lag("count", 1).over(w), lit(Long.MinValue)),
          lit(0)).otherwise(lit(1)))
      .withColumn("__grp", sum("__newGrp")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("referenceName", "__grp", "count")
      .agg(min("start").as("start"), max("end").as("end"))
      .select("referenceName", "start", "end", "count")
  }

  /** [[collapse]] with a bin-parallel first pass — lifts the per-contig
    * window parallelism limit at genome scale (25 human contigs would
    * starve 1000 executors): rows collapse within (contig, start/binSize)
    * partitions in parallel, then the plain per-contig pass merges the
    * surviving runs across bin edges. Run-merging of a sorted sequence is
    * confluent (merging neighbors never blocks other merges), so the
    * two-phase result is identical to one global pass — asserted in the
    * spec — while the expensive pass runs at contig × bins parallelism
    * and the global pass sees only collapsed runs. */
  def collapseBinned(coverage: DataFrame, binSize: Long = 10000000L): DataFrame = {
    val w = Window
      .partitionBy(col("referenceName"), (col("start") / binSize).cast("long").as("__bin"))
      .orderBy("start", "end")
    val local = coverage
      .withColumn("__bin", (col("start") / binSize).cast("long"))
      .withColumn("__newGrp",
        when(col("start") <= coalesce(lag("end", 1).over(w), lit(Long.MinValue)) &&
          col("count") === coalesce(lag("count", 1).over(w), lit(Long.MinValue)),
          lit(0)).otherwise(lit(1)))
      .withColumn("__grp", sum("__newGrp")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("referenceName", "__bin", "__grp", "count")
      .agg(min("start").as("start"), max("end").as("end"))
      .select("referenceName", "start", "end", "count")
    collapse(local)
  }

  /** Inverse of collapse: per-base rows from intervals.
    * Reference: CoverageDataset.flatten (CoverageDataset.scala:474-489). */
  def flatten(coverage: DataFrame): DataFrame =
    coverage
      .select(col("referenceName"),
        explode(sequence(col("start"), col("end") - 1)).as("start"),
        col("count"))
      .select(col("referenceName"), col("start"), (col("start") + 1).as("end"),
        col("count"))
}
