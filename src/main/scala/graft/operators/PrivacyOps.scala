package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk auditing over tabular columns — the release-gate
  * companion to [[TextOps.redactPii]]'s free-text scrubbing: before a
  * table (or a training corpus's metadata) ships, measure how
  * re-identifiable its quasi-identifier combinations are.
  *
  * Scale: everything is one map-side-combined aggregation over the
  * quasi-identifier key space followed by constant-size re-aggregation —
  * the [[SkewOps.keySkewReport]] shape; no row ever leaves its
  * projection. */
object PrivacyOps {

  /** k-anonymity audit: group rows by the quasi-identifier columns and
    * report, per table, how many equivalence classes fall below `k` and
    * how many rows they expose. A row in a class of size < k is
    * re-identifiable by an attacker who knows the quasi-identifiers —
    * `n_rows_at_risk = 0` is the release bar.
    *
    * Output (one row): (n_rows, n_classes, min_class_size,
    * n_small_classes, n_rows_at_risk, risk_rate) — risk_rate the one
    * double division. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k > 0)
    summarizeClassSizes(classSizes(df, quasiCols), k)
  }

  /** Phase 1 of the audit: equivalence-class sizes over the
    * quasi-identifier columns — ONE mergeable count aggregation, so it
    * also runs as a streaming complete-mode monitor (the state is one row
    * per class; [[graft.streaming.EventStreams.streamingKClassSizes]]).
    * Spark forbids chaining a second streaming aggregation, so the
    * summary runs per drained snapshot via [[summarizeClassSizes]]. */
  def classSizes(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty)
    // "__kn", not "n" — a quasi column named n must not collide
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__kn"))
  }

  /** Phase 2: fold a class-size table (any DataFrame with a `__kn`
    * count column) into the one-row report. */
  def summarizeClassSizes(classes: DataFrame, k: Long): DataFrame = {
    require(k > 0)
    classes.agg(
        sum("__kn").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min("__kn").as("min_class_size"),
        sum(when(col("__kn") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("__kn") < k, col("__kn")).otherwise(0L))
          .as("n_rows_at_risk"))
      .withColumn("risk_rate",
        col("n_rows_at_risk").cast("double") / col("n_rows").cast("double"))
  }

  /** The same audit per class — the drill-down view: every
    * quasi-identifier combination below `k` with its size, ordered
    * (n ASC, quasi cols) and cut to `top` rows. */
  def smallClasses(df: DataFrame, quasiCols: Seq[String], k: Long,
      top: Int = 100): DataFrame = {
    require(quasiCols.nonEmpty && k > 0 && top > 0)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
      .orderBy(col("class_size") +: quasiCols.map(col): _*)
      .limit(top)
  }
}
