package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact numeric statistics over quantized columns.
  *
  * Pearson correlation the engine-portable way: quantize each column to
  * longs (caller-chosen scale), subtract the truncating-division integer
  * mean, and aggregate the centered cross/self products as exact long
  * sums. The correlation then reduces to `sxy / (sqrt(sxx) * sqrt(syy))`
  * over integers below 2^53 — every step (long→double cast, sqrt,
  * multiply, divide) is correctly-rounded IEEE, so two engines computing
  * from the same sums produce the SAME double, bit for bit. The usual
  * streaming-variance float path cannot promise that (its partial sums
  * are order-sensitive).
  *
  * Scale shape: one pass for the means (k sums), one pass for all
  * k(k+1)/2 centered products (single aggregation, map-side combined);
  * the only collects are the two bounded k- and k^2-cell rows. Callers
  * pick scales so that n * (column spread * scale)^2 stays below 2^53. */
object Stats {

  /** Pairwise Pearson correlations of `cols` quantized by `scales`:
    * one row per unordered pair (col_a < col_b in list order) —
    * (col_a, col_b, n, sxy, sxx, syy, corr). */
  def correlationMatrix(
      df: DataFrame, cols: Seq[String], scales: Seq[Long]): DataFrame = {
    require(cols.length == scales.length && cols.length >= 2)
    val spark = df.sparkSession
    val k = cols.length
    val q = df.select(cols.zip(scales).map { case (c, s) =>
      floor(col(c) * s + 0.5).cast("long").as(c)
    }: _*)

    val meanRow = q.agg(count(lit(1)).as("n"),
        cols.map(c => sum(col(c)).as(s"s_$c")): _*)
      .collect().head
    val n = meanRow.getLong(0)
    require(n > 0, "correlationMatrix over an empty input")
    val means = cols.indices.map(i => meanRow.getLong(i + 1) / n)

    val centered = q.select(cols.zipWithIndex.map { case (c, i) =>
      (col(c) - lit(means(i))).as(c)
    }: _*)
    val prodExprs = for {
      i <- 0 until k; j <- i until k
    } yield sum(col(cols(i)) * col(cols(j))).as(s"p_${i}_$j")
    val sums = centered.agg(prodExprs.head, prodExprs.tail: _*).collect().head
    def s(i: Int, j: Int): Long = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      val idx = (0 until k).take(a).map(x => k - x).sum + (b - a)
      sums.getLong(idx)
    }

    val rows = for {
      i <- 0 until k; j <- (i + 1) until k
    } yield {
      val sxy = s(i, j); val sxx = s(i, i); val syy = s(j, j)
      val corr =
        if (sxx == 0L || syy == 0L) 0.0
        else sxy.toDouble / (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble))
      Row(cols(i), cols(j), n, sxy, sxx, syy, corr)
    }
    val schema = StructType(Seq(
      StructField("col_a", StringType, nullable = false),
      StructField("col_b", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sxy", LongType, nullable = false),
      StructField("sxx", LongType, nullable = false),
      StructField("syy", LongType, nullable = false),
      StructField("corr", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Per-group k-sigma outlier report with NO floating point: values
    * quantize to cents and the z-test runs as the cross-multiplied
    * integer inequality. From z^2 = (c - S/n)^2 / ((nQ - S^2)/n^2)
    * = (cn - S)^2 / (nQ - S^2), a row is an outlier at threshold
    * k = kPermille/1000 sigma iff
    *   (cn - S)^2 * 10^6  >  kPermille^2 * (nQ - S^2),
    * evaluated in 128-bit exact arithmetic (Spark DECIMAL(38,0) /
    * DuckDB HUGEINT) end to end — the moments s and q aggregate in
    * DECIMAL too, never LONG. Exactness envelope: the largest operand is
    * ~10^6 * (n * c_max)^2, within both engines' 38-digit cap while
    * n * c_max < ~10^16 (e.g. 10^11 rows per group at $1000-magnitude
    * cent values); beyond it DuckDB errors loudly and Spark nulls the
    * comparison — never a silent wrap, unlike LONG. The usual stddev()
    * route cannot promise engine agreement at any size
    * (order-sensitive float partials).
    *
    * Scale: one moments aggregation (n, S, Q per group — constant state,
    * map-side combined) joined back to the rows (AQE broadcasts the
    * group-moments side); one flag-and-count aggregation. Output:
    * (groupCol, n_total, n_outliers). */
  /** Per-group exact moments of the cent-quantized value column:
    * (groupCol, n, s, q) — constant mergeable state, map-side combined.
    * `s` and `q` aggregate in DECIMAL(38,0) (DuckDB HUGEINT): summing
    * `c*c` in LONG would silently wrap near 1e9 rows per group for cent
    * values around 1e5, far below the trillion-row envelope the 128-bit
    * z-test claims. The trainable "index" for [[zScoreOutliers]] and the
    * streaming probe
    * [[graft.streaming.EventStreams.streamingOutlierFlags]]. */
  def momentsTable(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    df.select(col(groupCol),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum(col("c").cast(dec) * col("c")).as("q"))
  }

  /** The exact integer z-test as a Column over (c, n, s, q) columns.
    * Every term lifts to DECIMAL(38,0) BEFORE multiplying — `c * n` in
    * LONG would itself wrap for large groups of large values. */
  def outlierFlag(kPermille: Long): Column = {
    val dec = DecimalType(38, 0)
    val d = col("c").cast(dec) * col("n") - col("s").cast(dec)
    d * d * lit(1000000L) >
      lit(kPermille * kPermille) *
        (col("n").cast(dec) * col("q") - col("s").cast(dec) * col("s"))
  }

  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      kPermille: Long = 3000L): DataFrame = {
    val base = df.select(col(groupCol),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
    base.join(momentsTable(df, groupCol, valueCol), groupCol)
      .withColumn("is_out", outlierFlag(kPermille))
      .groupBy(groupCol)
      .agg(max("n").as("n_total"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Per-group least-squares linear trend of a LONG y over a LONG x —
    * "is this source/event type growing or shrinking" drift detection
    * over (day, daily-count) style points, in closed form:
    * `slope = (n*Σxy − Σx*Σy) / (n*Σx² − (Σx)²)`,
    * `intercept = (Σy − slope*Σx) / n`.
    * All five sums aggregate in DECIMAL(38,0) (epoch-day x ~2e4 times
    * count y ~1e9 per row wraps LONG near 1e6 points), the numerator and
    * denominator are computed EXACTLY in decimal, and slope/intercept
    * are one fixed double chain each — engine-replayable. Groups with a
    * degenerate x spread (den = 0) report null slope/intercept.
    *
    * Output: (groupCol, n_points, slope, intercept).
    *
    * Scale: ONE map-side-combined aggregation; constant state per group. */
  def trendByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = col(xCol).cast("long").cast(dec)
    val y = col(yCol).cast("long").cast(dec)
    val agg = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x).cast(dec).as("sx"), sum(y).cast(dec).as("sy"),
      sum(x * y).cast(dec).as("sxy"), sum(x * x).cast(dec).as("sxx"))
    val num = col("n").cast(dec) * col("sxy") - col("sx") * col("sy")
    val den = col("n").cast(dec) * col("sxx") - col("sx") * col("sx")
    agg
      .withColumn("slope", when(den === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double")))
      .withColumn("intercept", when(den === 0, lit(null).cast("double"))
        .otherwise((col("sy").cast("double")
          - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")))
      .select(col(groupCol), col("n").as("n_points"),
        col("slope"), col("intercept"))
  }

  /** Per-group Wilson score lower bound on a pass rate — the
    * small-sample-honest way to RANK sources/domains by the fraction of
    * their documents passing a quality gate (a 2/2 source must not
    * outrank a 950/1000 one). `passCol` is a boolean column; `z` is the
    * confidence quantile (1.96 ~ 95%).
    *
    * wlb = (p + z²/2n − z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n) with
    * p = k/n — every term one fixed double chain over the exact integer
    * (n, k), replayable when the oracle states the identical expression.
    *
    * Output: (groupCol, n_docs, n_pass, wilson_lb); empty groups can't
    * occur (group keys come from the rows).
    *
    * Scale: one map-side-combined aggregation, constant per-group state. */
  def wilsonRanking(df: DataFrame, groupCol: String, passCol: String,
      z: Double = 1.96): DataFrame = {
    require(z > 0)
    val agg = df.groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col(passCol), 1L).otherwise(0L)).as("n_pass"))
    val nD = col("n_docs").cast("double")
    val p = col("n_pass").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val wlb = (p + z2 / (nD * lit(2.0))
      - lit(z) * sqrt(p * (lit(1.0) - p) / nD
        + z2 / (nD * nD * lit(4.0))))
      ./(lit(1.0) + z2 / nD)
    agg.withColumn("wilson_lb", wlb)
  }

  /** Trailing-window volume anomaly flags over per-group daily counts —
    * "did this source/event type spike or crater today vs its own recent
    * history". For each (group, day) row the trailing `lookback`
    * OBSERVATIONS (ROWS frame — gaps in the calendar shorten the window,
    * documented semantics) supply exact integer moments, and the flag is
    * the same 128-bit z-test as [[outlierFlag]]:
    * `(c*n − s)² · 10⁶ > k² · (n·q − s²)` with every term lifted to
    * DECIMAL(38,0) before multiplying. Rows with fewer than `minHistory`
    * trailing observations are never flagged (cold start).
    *
    * Output: input columns + `anomalous` boolean.
    *
    * Scale: one keyed window over the (group, day) aggregate — data-size
    * bounded by groups x days, not by raw events. */
  def volumeAnomalies(daily: DataFrame, groupCol: String, dayCol: String,
      countCol: String, lookback: Int = 7, minHistory: Long = 4L,
      kPermille: Long = 3000L): DataFrame = {
    require(lookback > 0 && minHistory > 0 && kPermille > 0)
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(groupCol).orderBy(col(dayCol))
      .rowsBetween(-lookback, -1)
    val c = col(countCol).cast("long").cast(dec)
    val withMoments = daily
      .withColumn("__wn", count(col(countCol)).over(w))
      .withColumn("__ws", sum(c).over(w).cast(dec))
      .withColumn("__wq", sum(c * col(countCol).cast("long")).over(w)
        .cast(dec))
    val d = c * col("__wn") - col("__ws")
    val flag = col("__wn") >= minHistory &&
      d * d * lit(1000000L) >
        lit(kPermille * kPermille) *
          (col("__wn").cast(dec) * col("__wq") - col("__ws") * col("__ws"))
    withMoments.withColumn("anomalous", flag)
      .drop("__wn", "__ws", "__wq")
  }

  /** Two-proportion A/B report per experiment group — "did variant B
    * convert differently from variant A, and is the difference
    * statistically real". Inputs are UNIT-level rows (one per user/
    * session, not per event): `variantCol` boolean (true = B),
    * `outcomeCol` boolean (true = converted). Per group the pooled
    * two-proportion z-test runs at alpha = 0.05:
    * `z² = D²·N / (na·nb·C·(N−C))` with `D = ca·nb − cb·na`,
    * `C = ca + cb`, `N = na + nb` — `significant` iff `z² > 3.8416`.
    *
    * Determinism contract: all counts are exact BIGINTs; the comparison
    * runs in DOUBLE as `|D|·sqrt(N) > 1.96·sqrt(na·nb·C·(N−C))` with a
    * fixed association — long→double conversion, multiply and sqrt are
    * all correctly-rounded IEEE ops, so Spark and a SQL oracle replay
    * the flag bit-for-bit (the integer products would need >38 decimal
    * digits at full scale, so DECIMAL(38,0) is NOT the right lift here).
    * Degenerate groups (no conversions, all conversions, or an empty
    * arm) get D = 0 and are never significant.
    *
    * Output: (groupCol, n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    * significant) — rates are int/int doubles, null for empty arms.
    *
    * Scale: one map-side-combined aggregation over unit rows; the output
    * is bounded by the number of experiment groups. */
  def abTestReport(units: DataFrame, groupCol: String, variantCol: String,
      outcomeCol: String): DataFrame = {
    val isB = col(variantCol)
    val conv = col(outcomeCol).cast("long")
    val agg = units.groupBy(groupCol).agg(
      sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(!isB, conv).otherwise(0L)).as("conv_a"),
      sum(when(isB, conv).otherwise(0L)).as("conv_b"))
    val dec = DecimalType(38, 0)
    val na = col("n_a"); val nb = col("n_b")
    val ca = col("conv_a"); val cb = col("conv_b")
    val n = na + nb
    val c = ca + cb
    // cross products in DECIMAL(38,0): ca*nb is exact to 1e38, THEN one
    // correctly-rounded cast to double — a LONG product would wrap past
    // arms of ~3e9 units
    val d = (ca.cast(dec) * nb - cb.cast(dec) * na).cast("double")
    val rhs = lit(1.96) *
      sqrt(na.cast("double") * nb.cast("double") * c.cast("double") *
        (n - c).cast("double"))
    agg
      .withColumn("rate_a",
        when(na > 0, ca.cast("double") / na.cast("double")))
      .withColumn("rate_b",
        when(nb > 0, cb.cast("double") / nb.cast("double")))
      .withColumn("significant", abs(d) * sqrt(n.cast("double")) > rhs)
  }

  /** Per-group Gini concentration of a non-negative LONG value column —
    * "is this source's token mass dominated by a few huge documents?",
    * the inequality diagnostic a curator reads next to [[momentsTable]]
    * before trusting per-source averages.
    *
    * With the group's values sorted ascending (ties broken by `tieBreak`)
    * and 1-based rank i:
    * `G = (2*Σ(i*x_i) - (n+1)*Σx_i) / (n*Σx_i)` — both Σ terms aggregate
    * in DECIMAL(38,0) (i*x_i reaches ~1e14 per row and 1e24 summed at
    * trillion-token sources, far past LONG), and the final value is ONE
    * fixed double chain over the exact aggregates, so any engine replays
    * it bit-for-bit. All-zero groups define G = 0.
    *
    * Output: (groupCol, n_docs, total, gini).
    *
    * Scale: one keyed window (rank within group) + one map-side-combined
    * aggregation; nothing unkeyed ever sees the data. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("x"), col("__tb"))
    val ranked = df.select(col(groupCol),
        col(valueCol).cast("long").as("x"), col(tieBreak).as("__tb"))
      .withColumn("i", row_number().over(w).cast("long"))
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x").cast(dec)).cast(dec).as("__s"),
        sum(col("i").cast(dec) * col("x")).cast(dec).as("__six"))
      .select(col(groupCol), col("n_docs"),
        col("__s").cast("long").as("total"),
        when(col("__s") === 0, lit(0.0)).otherwise(
          (lit(2.0) * col("__six").cast("double")
            - (col("n_docs").cast("double") + lit(1.0))
              * col("__s").cast("double"))
            / (col("n_docs").cast("double") * col("__s").cast("double")))
          .as("gini"))
  }

  /** Per-group percent-rank score normalization: each row's score maps
    * to `(rank - 1) / (n - 1)` within its group — rank over `scoreCol`
    * ascending with SQL RANK tie semantics (equal scores share a rank),
    * so the result is ORDER-DETERMINISTIC with no tie-break column at
    * all, and the division is int/int in IEEE double (engine-identical).
    * Single-row groups map to 0.0. This is the standard cross-source
    * score calibration step before mixing ranked corpora: raw quality /
    * perplexity scores are incomparable across sources, their
    * within-source percentiles are.
    *
    * Scale: NOT the built-in `percent_rank().over(partitionBy(group))` —
    * exact percent_rank needs a total order per group, and Spark executes
    * that window as "hash-partition by group, sort each ENTIRE group in
    * one task"; with a low-cardinality group key (q164's is event_type,
    * ~5 values) one reducer sorts ~N/5 rows at 100 TB. Instead this is
    * the [[Quantiles.globalRank]] two-phase distributed rank over
    * `(group, score)` (range-partition + in-partition sort, fully
    * parallel, no single-task group sort):
    *
    *   - `min(__grank)` per `(group, score)` is the 1-based start of each
    *     tie run in the global `(group, score)` order — subtracting the
    *     group's own `min(__grank)` gives exactly "rows in this group
    *     with a strictly smaller score", i.e. `rank - 1` under RANK tie
    *     semantics, independent of how the nondeterministic ids landed.
    *   - the per-group `(min, count)` summary is one row per group,
    *     broadcast back onto the (group, score) tie-run table, and the
    *     result re-attaches to the data with a hash join keyed by
    *     `(group, score)` — high-cardinality, AQE-splittable, never a
    *     per-group sort.
    *
    * NULL scores order first (matching the built-in's NULLS FIRST
    * ascending) and re-attach via a null-safe join. Output: input
    * columns + `pct_rank`. */
  def percentRankNormalize(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    require(!df.columns.contains("pct_rank"),
      s"percentRankNormalize writes a 'pct_rank' column; input already " +
        s"has one — rename it first (columns: ${df.columns.mkString(", ")})")
    val inCols = df.columns.toSeq
    val ranked = Quantiles.globalRank(df, Seq(col(groupCol), col(scoreCol)))
    val grp = ranked.groupBy(col(groupCol).as("__prg"))
      .agg(min("__grank").as("__gmin"), count(lit(1)).as("__gn"))
    val tieRuns = ranked
      .groupBy(col(groupCol).as("__prg"), col(scoreCol).as("__prs"))
      .agg(min(col("__grank")).as("__ts"))
      .join(broadcast(grp), "__prg")
      .select(col("__prg"), col("__prs"),
        when(col("__gn") === 1L, lit(0.0)).otherwise(
          (col("__ts") - col("__gmin")).cast("double")
            / (col("__gn") - 1L).cast("double")).as("pct_rank"))
    ranked.drop("__grank", "__total")
      .join(tieRuns,
        col(groupCol) <=> col("__prg") && col(scoreCol) <=> col("__prs"))
      .select(inCols.map(col) :+ col("pct_rank"): _*)
  }

  /** Robust outlier flags via MAD (median absolute deviation): per
    * group, med = exact disc median of `valueCol` (integer cents), mad =
    * exact disc median of |x - med|, and x flags when
    * |x - med| * 1000 > kPermille * mad — e.g. kPermille = 3500 is the
    * standard "3.5 MADs" rule (multiply by 1.4826 yourself if you want
    * sigma-equivalents). UNLIKE [[zScoreOutliers]], a single wild value
    * cannot drag the threshold (medians have a 50 % breakdown point),
    * and the entire decision path is INTEGER arithmetic — no doubles
    * anywhere. A zero-MAD group (majority at one value) flags every
    * deviation, by construction.
    *
    * Scale: two [[Quantiles.discPercentiles]] distributed ranks (no
    * buffering percentile agg), each summary broadcast back.
    * Output: input columns + (med, mad, is_out). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String, kPermille: Long = 3500L): DataFrame = {
    require(kPermille > 0)
    val med = Quantiles.discPercentiles(
        df, groupCol, valueCol, tieBreak, Seq(0.5))
      .select(col(groupCol), col("p50").as("med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = Quantiles.discPercentiles(
        withMed, groupCol, "__dev", tieBreak, Seq(0.5))
      .select(col(groupCol), col("p50").as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_out",
        col("__dev") * 1000L > lit(kPermille) * col("mad"))
      .drop("__dev")
  }

  /** Winsorization audit: per group, the exact disc p1/p99 cut points of
    * an integer `valueCol` (cents) and the clipping impact of clamping
    * to [p1, p99] — the report a pipeline reviews before committing to
    * outlier clipping, and the exact bookkeeping to prove the clamp did
    * what it claimed (sum deltas in integer cents, never floats).
    *
    * Scale: [[Quantiles.discPercentiles]]' distributed rank for the cuts
    * (no buffering percentile aggregate), the bounded per-group cut rows
    * broadcast back onto the data, one map-side-combined aggregation.
    *
    * Output per group: (groupCol, n, lo_cut, hi_cut, n_low, n_high,
    * sum_cents, sum_winsorized_cents). */
  def winsorizeReport(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String): DataFrame = {
    val cuts = Quantiles.discPercentiles(
        df, groupCol, valueCol, tieBreak, Seq(0.01, 0.99))
      .select(col(groupCol), col("p1").as("lo_cut"),
        col("p99").as("hi_cut"))
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .join(broadcast(cuts), Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        max("lo_cut").as("lo_cut"), max("hi_cut").as("hi_cut"),
        sum(when(col("__v") < col("lo_cut"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("__v") > col("hi_cut"), 1L).otherwise(0L)).as("n_high"),
        sum(col("__v")).cast("long").as("sum_cents"),
        sum(greatest(least(col("__v"), col("hi_cut")), col("lo_cut")))
          .cast("long").as("sum_winsorized_cents"))
  }
}
