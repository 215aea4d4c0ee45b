package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — the time-domain twin of [[CoverageOps.collapse]]
  * (SURVEY.md §2.10: the reference has no streaming; this is our green-field
  * extension, shared between the batch path here and the Structured
  * Streaming path in [[graft.streaming.EventStreams]]).
  */
object Sessionize {

  /** Assign a session id per key: a new session starts when the gap to the
    * previous event exceeds `gapSeconds`. Deterministic tie-break on
    * `tieBreak` (a unique column) for equal timestamps.
    *
    * Scale: one shuffle on the session key; windows are computed per key
    * partition. Skewed keys (one user = millions of events) are the known
    * hazard — AQE skew handling applies since this is a plain hash exchange.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    events
      .withColumn("__prevTs", lag(col(tsCol), 1).over(w))
      .withColumn("__newSession",
        when(col("__prevTs").isNull ||
          col(tsCol).cast("long") - col("__prevTs").cast("long") > gapSeconds,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id",
        sum("__newSession").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prevTs", "__newSession")
  }

  /** Collapse events into per-session summary rows. */
  def sessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      gapSeconds: Long,
      aggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(col(tsCol)).cast("long").as("session_start"),
      max(col(tsCol)).cast("long").as("session_end"),
      count(lit(1)).as("n_events"))
    sessionize(events, keyCol, tsCol, tieBreak, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(base.head, (base.tail ++ aggs): _*)
  }
}
