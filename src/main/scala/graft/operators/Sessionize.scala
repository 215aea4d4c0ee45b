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

  /** As-of (backward) join — the time-series operator Spark's join algebra
    * lacks: for every left row, the single right row with the greatest
    * `rightTime` <= `leftTime` within the same `keys` (inclusive; ties on
    * rightTime broken by the LAST value of `rightTieBreak`, a unique
    * column). Left rows with no prior right row keep nulls.
    *
    * Implemented as the union-marker + ordered-carry composition, NOT a
    * per-left-row subquery: both inputs union into one stream tagged
    * left/right, one window per key ordered by (time, side, tieBreak)
    * carries `last(right payload, ignoreNulls)` forward, and left rows
    * read the carry. ONE shuffle+sort on the join keys total — cost is
    * that of a sort-merge join regardless of how many right rows precede
    * each left row (a naive `rightTime <= leftTime` theta join is
    * quadratic per key). Right rows sort before left rows at equal time,
    * so an exactly-simultaneous right row IS matched.
    *
    * Output: every left column, plus each of `rightCols` as
    * `<prefix><name>`. Scale: plain hash exchange on `keys` (AQE skew
    * split applies); window state is one carried struct per key. */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String], rightTieBreak: String,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty && rightCols.nonEmpty, "asofJoin needs keys+cols")
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    val lType = left.select(leftCols.map(col): _*).schema
    val rType = right.select(rightCols.map(col): _*).schema
    val lS = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__isL"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rS = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__isL"),
        lit(null).cast(lType).as("__l"),
        struct(rightCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isL").asc,
        col("__r").getField(rightTieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lS.unionByName(rS)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isL") === 1)
      .select(keys.map(col) ++
        leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}
