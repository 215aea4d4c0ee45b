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

  /** Recency-weighted trailing mean with DYADIC weights: over the last
    * `window` points of each group's series (ordered by `dayCol`), the
    * j-th most recent point weighs 2^(window-1-j) — half-weight per step
    * back, the EMA decay shape made exactly windowable (a true EMA's
    * infinite tail cannot be computed exactly in a frame; the dyadic
    * window can, and is engine-bit-reproducible: integer numerator and
    * denominator, ONE double division at the end).
    *
    * Cold starts (fewer than `window` trailing points) renormalize over
    * the weights present, so early rows are unbiased means of what
    * exists, never damped toward zero.
    *
    * Scale: `window` lag expressions over ONE keyed window exchange —
    * per-row state is the constant frame, independent of series depth.
    *
    * Input must be unique on (group, day). Output: input columns +
    * (num, den, smoothed). */
  def dyadicTrailingMean(daily: DataFrame, groupCol: String,
      dayCol: String, valueCol: String, window: Int = 8): DataFrame = {
    require(window >= 1 && window <= 62,
      s"window must be in [1, 62]: $window")
    val w = Window.partitionBy(groupCol).orderBy(dayCol)
    // accumulate in DECIMAL(38,0): v * 2^(window-1) overflows long once
    // window is large (at window=62 any value > 3 wraps). den always fits
    // in long (< 2^window); num casts back to long for the stable output
    // schema — an out-of-long-range numerator surfaces as NULL (with the
    // exact `smoothed` computed pre-cast), never a silent wraparound.
    val dec = "decimal(38,0)"
    val terms = (0 until window).map { j =>
      val wt = 1L << (window - 1 - j)
      val v = if (j == 0) col(valueCol) else lag(valueCol, j).over(w)
      (coalesce(v.cast(dec) * lit(wt).cast(dec), lit(0L).cast(dec)),
        when(v.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    val numDec = terms.map(_._1).reduce(_ + _)
    val denL = terms.map(_._2).reduce(_ + _).cast("long")
    daily
      .withColumn("den", denL)
      .withColumn("smoothed",
        numDec.cast("double") / col("den").cast("double"))
      .withColumn("num", numDec.try_cast("long"))
      .select(daily.columns.map(col) :+ col("num") :+ col("den") :+
        col("smoothed"): _*)
  }
}
