package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-regularization operators over keyed daily series — the gap
  * handling a pipeline needs BEFORE trailing-window logic is trustworthy
  * ([[Stats.volumeAnomalies]]'s ROWS frame shortens across calendar gaps;
  * filling first restores "last 7 calendar days" semantics).
  */
object TimeSeriesOps {

  /** Per-group calendar gap fill + last-observation-carried-forward: for
    * every group, every integer day in `[min(day), max(day)]` of THAT
    * group gets a row; days absent from the input carry the most recent
    * observed value forward and are marked `observed = false`. The first
    * day of a group is always observed (it is the group's min), so the
    * fill never reads before the series starts.
    *
    * Input must be unique on (group, day) — aggregate first.
    * Output: (groupCol, dayCol, valueCol, observed).
    *
    * Scale: the calendar explode is bounded by each group's day SPAN
    * (thousands of rows per group for years of history — never data
    * volume); the forward fill is one keyed window per group ordered by
    * day. Both shuffle on the group key only, and the span arrays are
    * calendar-bounded so the `sequence` materialization stays tiny
    * (unlike value-length sequences, which must block-explode). */
  def calendarFill(daily: DataFrame, groupCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val cal = daily
      .groupBy(groupCol)
      .agg(min(dayCol).as("__lo"), max(dayCol).as("__hi"))
      .select(col(groupCol),
        explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
    val w = Window.partitionBy(groupCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal
      .join(daily.select(col(groupCol), col(dayCol), col(valueCol)),
        Seq(groupCol, dayCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .select(col(groupCol), col(dayCol), col(valueCol), col("observed"))
  }
}
