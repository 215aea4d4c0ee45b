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

  /** Weekly seasonality profile per key — "is this key's traffic shape
    * the corpus's shape?": event counts on the (day-of-week, hour) grid
    * with the expected count under independence (key volume × global
    * slot share) and the exact ratio in permille. A bot hammering at
    * 03:00 Sundays reads ratio ≫ 1000 in slots where the corpus sleeps;
    * a key whose permille profile tracks 1000 everywhere has no
    * seasonality of its own.
    *
    * `ratio_permille = n·grand_total·1000 div (key_total·slot_total)` —
    * every term an exact integer count, the division a single integer
    * floor (engine-identical; slot_total > 0 by construction since the
    * slot appears in the grid). Day-of-week and hour come from epoch-
    * millis INTEGER arithmetic (UTC; epoch day 0 was a Thursday, so
    * dow = (days + 4) mod 7 with 0 = Sunday) — never from calendar
    * functions, whose timezone/DST rules differ across engines. The
    * day/hour divisions FLOOR (pmod-based, like ratio_permille), so
    * pre-1970 timestamps (negative epoch-millis) land in the correct
    * slot instead of the truncate-toward-zero off-by-one.
    *
    * Output per (key, dow, hour): (keyCol, dow, hour, n, key_total,
    * slot_total, ratio_permille).
    *
    * Scale: ONE map-side-combined (key, dow, hour) count collapses the
    * data (grid ≤ |keys|·168); key totals ride a key-window and slot
    * totals a slot-window over that bounded grid; the grand total is a
    * broadcast 1-row re-aggregate. Key cardinality unbounded. */
  def seasonalProfile(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    seasonalFromCounts(seasonalSlotCounts(df, keyCol, tsCol), keyCol)

  /** The mergeable (key, dow, hour, __n) grid phase of
    * [[seasonalProfile]] — ONE map-side-combined count; counts add, so
    * the same plan runs as a complete-mode streaming aggregation
    * ([[graft.streaming.EventStreams.streamingSeasonalSlotCounts]]
    * delegates here — one definition, the shared-phase rule). */
  def seasonalSlotCounts(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    df
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), unix_millis(col(tsCol)).as("__ms"))
      .select(col("__k"),
        expr("cast(pmod((__ms - pmod(__ms, 86400000)) div 86400000 + 4," +
          " 7) as int)").as("dow"),
        expr("cast(pmod((__ms - pmod(__ms, 3600000)) div 3600000, 24)" +
          " as int)").as("hour"))
      .groupBy("__k", "dow", "hour")
      .agg(count(lit(1)).cast(dec).as("__n"))
  }

  /** Finish [[seasonalProfile]] from a (__k, dow, hour, __n) grid —
    * key/slot totals as keyed windows and the grand total as a
    * broadcast 1-row re-aggregate, all over the bounded
    * (|keys|·168) grid. */
  def seasonalFromCounts(grid: DataFrame, keyCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val grand = grid.agg(sum("__n").cast(dec).as("__grand"))
    grid
      .withColumn("__kt",
        sum("__n").over(Window.partitionBy("__k")).cast(dec))
      .withColumn("__st",
        sum("__n").over(Window.partitionBy("dow", "hour")).cast(dec))
      .crossJoin(broadcast(grand))
      .select(col("__k").as(keyCol), col("dow"), col("hour"),
        col("__n").cast("long").as("n"),
        col("__kt").cast("long").as("key_total"),
        col("__st").cast("long").as("slot_total"),
        ((col("__n") * col("__grand") * 1000 -
          pmod(col("__n") * col("__grand") * 1000,
            col("__kt") * col("__st"))) /
          (col("__kt") * col("__st"))).cast("long").as("ratio_permille"))
  }

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

  /** Lag-`lagK` autocorrelation of each key's bucketed event volume —
    * the periodicity detector: human traffic autocorrelates strongly at
    * the daily/weekly lag, scripted traffic at its cron interval, and a
    * feed with NO volume memory (acf ≈ 0 at every lag) is usually
    * synthetic. Pearson correlation of the (volume at t, volume at
    * t − lagK) pairs, CALENDAR lag: pairs come from a keyed self-join of
    * the bucket grid on `(key, bucket − lagK)`, so holes in the timeline
    * never misalign the lag the way a row-offset `lag()` window would.
    *
    * Exactness: the five moment sums accumulate in DECIMAL(38,0) (count
    * cross-products pass LONG at 100 TB), and
    * `acf = (nΣxy − ΣxΣy) / (√(nΣx² − (Σx)²) · √(nΣy² − (Σy)²))` is one
    * fixed double chain over those exact integers (the
    * [[Stats.correlationMatrix]] recipe). Keys with < 2 pairs or a
    * zero-variance side report NULL.
    *
    * Output per key: (key, n_pairs, acf).
    *
    * Scale: the [[graft.operators.Sessionize.bucketCounts]] phase (ONE
    * map-side-combined aggregation, shared verbatim with the streaming
    * bucket-count state) collapses event volume to the (key, bucket)
    * grid; the self-join and the moment aggregation are keyed over that
    * bounded grid only. */
  def autocorrByKey(events: DataFrame, keyCol: String, tsCol: String,
      bucketMs: Long, lagK: Int): DataFrame = {
    require(lagK > 0, s"lag must be positive: $lagK")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val counts = graft.operators.Sessionize
      .bucketCounts(events, keyCol, tsCol, bucketMs)
    val x = counts.select(col("key"), col("bucket"), col("n").as("__x"))
    val y = counts.select(col("key"),
      (col("bucket") + lagK).as("bucket"), col("n").as("__y"))
    x.join(y, Seq("key", "bucket"))
      .groupBy("key")
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x").cast(dec)).cast(dec).as("__sx"),
        sum(col("__y").cast(dec)).cast(dec).as("__sy"),
        sum((col("__x") * col("__y")).cast(dec)).cast(dec).as("__sxy"),
        sum((col("__x") * col("__x")).cast(dec)).cast(dec).as("__sxx"),
        sum((col("__y") * col("__y")).cast(dec)).cast(dec).as("__syy"))
      .select(col("key"), col("__n").cast("long").as("n_pairs"),
        when(col("__n") < 2
            || col("__n") * col("__sxx") === col("__sx") * col("__sx")
            || col("__n") * col("__syy") === col("__sy") * col("__sy"),
          lit(null).cast("double"))
          .otherwise(
            (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
              .cast("double") /
              (sqrt((col("__n") * col("__sxx") -
                col("__sx") * col("__sx")).cast("double")) *
                sqrt((col("__n") * col("__syy") -
                  col("__sy") * col("__sy")).cast("double"))))
          .as("acf"))
  }
}
