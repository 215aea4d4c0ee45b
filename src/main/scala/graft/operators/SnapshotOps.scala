package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus accounting: what changed between two snapshots.
  *
  * Production training corpora are rebuilt periodically from crawls, and
  * the first question every refresh raises is the delta: which documents
  * are new, which disappeared, which changed content — because the
  * downstream incremental passes (re-embedding, re-deduplication against
  * the index, tokenizer re-training triggers) run on the delta, not the
  * full corpus. The reference pipeline answers this by re-reading both
  * snapshots; here the comparison is one full-outer equi-join on the
  * document key comparing CONSTANT-WIDTH fingerprints, never text.
  *
  * Scale shape (100 TB): the only exchange is the id-keyed join, which
  * co-partitions both snapshots; with bucketed snapshot layouts (see
  * [[Bucketing]]) it is shuffle-free. Fingerprints are computed in the
  * scan projection (16-byte md5 of normalized text, the exact-dedup key of
  * [[TextOps.fingerprint]]), so join rows are (key, 16 bytes) regardless
  * of document size, and the text columns are pruned from both scans.
  */
object SnapshotOps {

  /** Per-document delta between an `old` and a `nw` snapshot.
    *
    * Inputs need `idCol` and `textCol`; `carryCols` (from the NEW snapshot,
    * falling back to the old one for deleted rows) are carried into the
    * output for per-source reporting.
    *
    * Output: (idCol, carryCols*, status) with status one of
    * 'added' | 'deleted' | 'changed' | 'unchanged'.
    */
  def snapshotDelta(
      old: DataFrame,
      nw: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    def keyed(df: DataFrame, side: String): DataFrame =
      df.select(
        Seq(col(idCol).as(s"${side}_id"),
          TextOps.fingerprint(col(textCol)).as(s"${side}_fp")) ++
          carryCols.map(c => col(c).as(s"${side}_$c")): _*)
    val o = keyed(old, "o")
    val n = keyed(nw, "n")
    val joined = o.join(n, col("o_id") === col("n_id"), "full_outer")
    val status = when(col("o_id").isNull, lit("added"))
      .when(col("n_id").isNull, lit("deleted"))
      .when(col("o_fp") === col("n_fp"), lit("unchanged"))
      .otherwise(lit("changed"))
    joined.select(
      Seq(coalesce(col("n_id"), col("o_id")).as(idCol)) ++
        carryCols.map(c =>
          coalesce(col(s"n_$c"), col(s"o_$c")).as(c)) ++
        Seq(status.as("status")): _*)
  }

  /** The delta rolled up per group: counts of each status — the refresh
    * report a corpus dashboard shows. One additional keyed aggregation
    * over the (bounded-width) delta rows. */
  def snapshotDeltaReport(
      delta: DataFrame, groupCols: Seq[String]): DataFrame =
    delta.groupBy(groupCols.map(col): _*)
      .agg(
        count(when(col("status") === "added", 1)).as("n_added"),
        count(when(col("status") === "deleted", 1)).as("n_deleted"),
        count(when(col("status") === "changed", 1)).as("n_changed"),
        count(when(col("status") === "unchanged", 1)).as("n_unchanged"))

  /** Corpus growth curve over a crawl timeline: per `dayCol` epoch, how
    * many sightings arrived, how many DISTINCT contents they carried,
    * how many contents were genuinely NEW (first sighting of their
    * fingerprint anywhere in the timeline), and the running distinct
    * total — the "is the crawl still finding new data or re-fetching the
    * web it already has" curve every collection pipeline watches, and
    * the capacity-planning input for dedup state (cum_distinct IS the
    * fingerprint-store size at each epoch). Content identity is the
    * exact-dedup key ([[TextOps.fingerprint]] normalization: trim,
    * collapse whitespace, lowercase, md5).
    *
    * Output: (day, n_sightings, n_distinct, n_new, cum_distinct), one
    * row per epoch present in the data; `sum(n_new)` = corpus-wide
    * distinct fingerprints and `cum_distinct` of the last epoch equals
    * it too.
    *
    * Scale: three keyed passes over the (day, fp) projection — a
    * map-side-combined per-day count, a (day, fp) distinct for the
    * per-day distinct counts, and a per-fp `min(day)` for first
    * sightings (the volume-keyed exchange) — then a join + running sum
    * on the BOUNDED per-day table (the only unkeyed window). Text never
    * shuffles; every exchange carries (day, 16-byte fp). */
  def corpusGrowthCurve(
      docs: DataFrame, textCol: String, dayCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sight = docs.select(col(dayCol).cast("long").as("day"),
      TextOps.fingerprint(col(textCol)).as("__fp"))
    val perDay = sight.groupBy("day")
      .agg(count(lit(1)).as("n_sightings"))
    val distinctPerDay = sight.distinct()
      .groupBy("day").agg(count(lit(1)).as("n_distinct"))
    val newPerDay = sight.groupBy("__fp")
      .agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    perDay
      .join(distinctPerDay, Seq("day"))
      .join(newPerDay, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_distinct", sum("n_new").over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
