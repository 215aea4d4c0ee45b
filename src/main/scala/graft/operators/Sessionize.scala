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

  /** Ordered-funnel stage tables: stage i holds, per key, the FIRST time
    * the i-th `steps` event type occurred STRICTLY AFTER the key's stage
    * i-1 time (stage 0 = first occurrence of steps.head), and — when
    * `maxGap` is set — no later than stage i-1's time + maxGap (same units
    * as `tsCol`). Keys drop out of later tables when the order is never
    * completed — the classic conversion funnel. Returns one DataFrame per
    * stage: (key, t1, ..., t_{i+1}).
    *
    * Each stage is a filter + map-side-combined min aggregation joined to
    * the (strictly shrinking) previous stage — |steps| shuffles on the key,
    * no windows, no per-user event sorting. */
  def funnelStages(
      events: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGap: Option[Long] = None): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val cur = events.filter(col(typeCol) === step)
        val stage =
          if (i == 0)
            cur.groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
          else {
            val carried = (1 to i).map(j => col(s"t$j"))
            val within = maxGap.map(g =>
              col(tsCol) <= col(s"t$i") + lit(g)).getOrElse(lit(true))
            cur.join(acc.last, Seq(keyCol))
              .filter(col(tsCol) > col(s"t$i") && within)
              .groupBy(col(keyCol) +: carried: _*)
              .agg(min(col(tsCol)).as(s"t${i + 1}"))
          }
        acc :+ stage
    }
  }

  /** Funnel summary: one row per stage — (step, n_keys) with step labeled
    * `"<ordinal>_<event type>"` — counting the keys that reached it in
    * order. */
  def funnelCounts(
      events: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGap: Option[Long] = None): DataFrame =
    funnelStages(events, keyCol, typeCol, tsCol, steps, maxGap).zipWithIndex
      .map { case (stage, i) =>
        stage.agg(count(lit(1)).as("n_keys"))
          .select(lit(s"${i + 1}_${steps(i)}").as("step"), col("n_keys"))
      }
      .reduce(_.unionByName(_))

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

  /** First-order Markov transition counts over each key's time-ordered
    * event stream — the path-analysis primitive behind "what do users do
    * next" dashboards and behavioral-cohort features. Per key, events are
    * ordered by `(tsCol, tieBreak)` (the unique tie-break makes the chain
    * deterministic under equal timestamps); every adjacent pair
    * contributes one `(from_type, to_type)` observation. Output:
    * `(from_type, to_type, n_transitions)`.
    *
    * Scale: ONE shuffle on the key for the per-key ordered window (AQE
    * skew-splits hot keys), then a map-side-combined count over the tiny
    * (|types|²-bounded) transition matrix — the second exchange carries
    * only partial counts, never events. */
  def eventTransitions(
      events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    events
      .select(col(keyCol), col(typeCol).as("from_type"),
        col(tsCol), col(tieBreak))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Top-`k` consecutive event-type TRIGRAMS across all keys' timelines —
    * the path-discovery step up from [[eventTransitions]]' first-order
    * matrix: "view→click→purchase happened 12k times" is the funnel
    * candidate a pipeline then formalizes with [[funnelCounts]]. Per key,
    * events order by `(tsCol, tieBreak)` (deterministic under equal
    * timestamps); every run of three consecutive events contributes one
    * `(t1, t2, t3)` observation; chains never cross keys. Output:
    * `(t1, t2, t3, n_paths)` — the k most frequent, ties broken by the
    * path ascending (fully order-deterministic).
    *
    * Scale: the SAME single keyed window exchange as eventTransitions
    * (two `lead`s share one window spec — one exchange, one sort), a
    * map-side-combined count over the |types|³-bounded path table, and a
    * TakeOrdered head — never a global sort. */
  def eventPathTrigrams(
      events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreak: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    events
      .select(col(keyCol), col(typeCol).as("t1"),
        col(tsCol), col(tieBreak))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(desc("n_paths"), asc("t1"), asc("t2"), asc("t3"))
      .limit(k)
  }

  /** SCD2 (slowly-changing-dimension type 2) validity intervals from an
    * event log: per key, ordered by (time, tieBreak), keep only the rows
    * where the tracked attribute CHANGES (null-safe; the first row always
    * opens a version) and date each surviving version with
    * `valid_from_ms` = its event time and `valid_to_ms` = the next
    * change's time (NULL while current). This is the
    * point-in-time-correct feature table of ML hygiene: joining facts
    * with [[asofJoin]] against it picks the version in effect AT the
    * fact's time, so training can never see a future attribute value
    * (leakage-free feature joins).
    *
    * Scale: ONE shuffle on the key; the change-detect lag and the
    * horizon lead run over the same key-partitioned ordering (the second
    * window sorts only surviving change rows). No corpus-wide state.
    * Output: (keyCol, attrCol, version 1-based, valid_from_ms,
    * valid_to_ms). */
  def scd2Intervals(
      events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieBreak: String): DataFrame = {
    val base = events.select(col(keyCol), col(attrCol),
      unix_millis(col(tsCol)).as("__ms"), col(tieBreak))
    val w = Window.partitionBy(keyCol).orderBy(col("__ms"), col(tieBreak))
    base
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col("__prev") <=> col(attrCol)))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_ms", col("__ms"))
      .withColumn("valid_to_ms", lead(col("__ms"), 1).over(w))
      .select(col(keyCol), col(attrCol), col("version"),
        col("valid_from_ms"), col("valid_to_ms"))
  }

  /** Bounded-history next-event training examples: for every event, the
    * up-to-`historyLen` event types that PRECEDED it (same key, ordered by
    * time with a deterministic tie-break) joined into one '>'-separated
    * history string, labeled with the event's own type. This is the
    * sequence→next-item example generator of session-based
    * recommendation / behavioral-LM training — the event log becomes
    * (history, label) supervision rows in one pass.
    *
    * Scale: ONE shuffle on the key, then a key-partitioned window whose
    * frame is capped at `historyLen` ROWS — per-row state is bounded by
    * the constant history length, never by session length. Events with no
    * predecessor emit history '' (the cold-start class). No collect, no
    * corpus-wide state.
    *
    * Output: (keyCol, tieBreak, history, label). */
  def nextEventExamples(
      events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreak: String, historyLen: Int): DataFrame = {
    require(historyLen > 0, s"historyLen must be positive: $historyLen")
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(-historyLen, -1)
    events
      .select(col(keyCol), col(typeCol), col(tsCol), col(tieBreak))
      .withColumn("history",
        concat_ws(">", collect_list(col(typeCol)).over(w)))
      .select(col(keyCol), col(tieBreak), col("history"),
        col(typeCol).as("label"))
  }

  /** Daily + rolling EXACT distinct actives (DAU / WAU-style): for every
    * day with events, the distinct `keyCol` count that day AND over the
    * trailing `windowDays`-day window ending that day. Rolling distinct
    * is NOT decomposable, so it's computed by the contribute-forward
    * rewrite: each distinct (key, day) pair explodes to the `windowDays`
    * window-end days it belongs to, and the window count is a plain
    * distinct + count — exact at any scale, cost bounded at
    * `windowDays x |distinct pairs|`, never a per-day re-scan.
    *
    * Output: (day, dau, rolling) — `day` = epoch-day of `tsCol`, rows
    * only for days that have events. */
  def rollingDistinctActives(events: DataFrame, keyCol: String,
      tsCol: String, windowDays: Int): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive: $windowDays")
    val pairs = events
      .select(col(keyCol).as("__k"),
        expr(s"unix_millis(`$tsCol`) div 86400000").as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val rolling = pairs
      .select(col("__k"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("wday"))
      .distinct()
      .groupBy("wday").agg(count(lit(1)).as("rolling"))
    // one row per active day — bounded by the time range: materialize and
    // release the distinct-pair cache (tier 1, see operators/Caching.scala)
    Caching.materializeAndRelease(
      dau.join(rolling, dau("day") === rolling("wday"))
        .select(col("day"), col("dau"), col("rolling")),
      pairs)
  }

  /** Retention triangle — the classic cohort analysis: users are grouped
    * by their FIRST active day (the cohort), and for every later day of
    * activity the cell (cohort_day, age_days) counts how many of that
    * cohort came back `age_days` days after joining. Age 0 is the cohort
    * size itself; a user contributes at most once per (cohort, age)
    * because activity is reduced to distinct (key, day) pairs first.
    *
    * Output: (cohort_day, age_days, n_active).
    *
    * Scale: distinct pairs (one map-side-combined shuffle on the key),
    * a per-key min for the cohort (same key partitioning — exchange
    * reuse), one join keyed by the user (AQE picks shuffle-hash; skew on
    * power users is impossible after the distinct), then a
    * map-side-combined count over the (days x days)/2-bounded triangle.
    * Nothing scales with raw event volume past the first distinct. */
  def retentionCohorts(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val pairs = events
      .select(col(keyCol).as("__k"),
        expr(s"unix_millis(`$tsCol`) div 86400000").as("day"))
      .distinct()
    val cohorts = pairs.groupBy("__k").agg(min("day").as("cohort_day"))
    pairs.join(cohorts, "__k")
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("age_days"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Per-group inter-arrival profile: the millisecond gaps between each
    * key's CONSECUTIVE events (ordered by time, ties broken by `idCol`),
    * grouped by the LATER event's `groupCol` and summarized with exact
    * disc percentiles — the latency/cadence fingerprint that feeds rate
    * limiting, bot detection, and session-gap tuning (is 30 min actually
    * past this population's p99 think time?).
    *
    * Scale: ONE keyed window (lag over the key partition — the
    * [[sessionize]] exchange) produces the gaps; the summary reuses
    * [[Quantiles.discPercentiles]]' distributed rank, so no buffering
    * percentile aggregate ever holds a group in memory.
    *
    * Output per group: (groupCol, n, p50, p90, p99) — gap milliseconds,
    * exact data values (disc semantics, engine-reproducible). */
  def interArrivalStats(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, groupCol: String): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__ms"), col(idCol))
    val gaps = events
      .select(col(keyCol).as("__k"), col(groupCol),
        expr(s"unix_millis(`$tsCol`)").as("__ms"), col(idCol))
      .withColumn("__gap", col("__ms") - lag("__ms", 1).over(w))
      .filter(col("__gap").isNotNull)
    Quantiles.discPercentiles(
      gaps, groupCol, "__gap", idCol, Seq(0.5, 0.9, 0.99))
  }

  /** Burst-activity (bot-likelihood) report: per key, the total event
    * count and the MAXIMUM events inside any single fixed time bucket of
    * `bucketMs` — the cheap rate heuristic every ingest pipeline runs to
    * flag crawler/scripted traffic before it poisons engagement counts
    * (humans don't emit 50 events in a minute; a fixed-bucket max is a
    * deterministic, engine-replayable stand-in for a sliding-window
    * rate). `is_burst` flags keys whose max bucket reaches
    * `burstThreshold`.
    *
    * Output: (key, n_events, max_per_bucket, is_burst).
    *
    * Scale: two stacked map-side-combined aggregations — (key, bucket)
    * counts then per-key max/sum — both keyed, no window, no shuffle
    * wider than the distinct (key, bucket) projection. */
  def burstActivityReport(events: DataFrame, keyCol: String,
      tsCol: String, bucketMs: Long, burstThreshold: Long): DataFrame =
    burstFromBucketCounts(bucketCounts(events, keyCol, tsCol, bucketMs),
      burstThreshold)

  /** The mergeable (key, bucket, n) count phase of
    * [[burstActivityReport]] — ONE map-side-combined aggregation. The
    * same unresolved plan works on a streaming frame, which is exactly
    * what [[graft.streaming.EventStreams.streamingBucketCounts]]
    * delegates to (single definition — the tokenization lesson: twins
    * that duplicate the phase body can silently diverge). */
  def bucketCounts(events: DataFrame, keyCol: String, tsCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive: $bucketMs")
    events
      .select(col(keyCol).as("key"),
        expr(s"unix_millis(`$tsCol`) div $bucketMs").as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Finish [[burstActivityReport]] from a (key, bucket, n) count
    * relation — the shape
    * [[graft.streaming.EventStreams.streamingBucketCounts]] maintains as
    * mergeable complete-mode state, so the live monitor folds its
    * drained snapshot through this for the same flags as batch. */
  def burstFromBucketCounts(counts: DataFrame,
      burstThreshold: Long): DataFrame = {
    require(burstThreshold > 0,
      s"burstThreshold must be positive: $burstThreshold")
    counts
      .groupBy("key")
      .agg(sum("n").as("n_events"), max("n").as("max_per_bucket"))
      .withColumn("is_burst", col("max_per_bucket") >= burstThreshold)
  }

  /** RFM (recency / frequency / monetary) tier scoring — the classic
    * user-value segmentation: per key, the last-activity timestamp, event
    * count, and exact money total (integer cents, never a float sum),
    * each cut into `tiers` equal-depth tiers with
    * [[Quantiles.globalNtile]] (exact ANSI ntile — parallel range rank,
    * no global sort) so tier `tiers` is always the most-recent /
    * most-frequent / highest-spend stratum. Orientation: every dimension
    * ranks ASCENDING with the key as tie-break, so score semantics are
    * deterministic and the oracle replays them with its own `ntile`.
    * `rfm = r*100 + f*10 + m` is the usual segment label ("555" = best).
    *
    * Output: (key, last_ts_ms, n_events, monetary_cents,
    * r_score, f_score, m_score, rfm).
    *
    * Scale: ONE map-side-combined per-key aggregation collapses the
    * event volume to a row per key; the three ntile passes then
    * range-exchange only that per-key table (the q132 shape — broadcast
    * per-partition offsets, never a single-partition sort). */
  def rfmScores(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tiers: Int = 5): DataFrame = {
    require(tiers > 0, s"tiers must be positive: $tiers")
    val perKey = events.groupBy(col(keyCol).as("key"))
      .agg(max(unix_millis(col(tsCol))).as("last_ts_ms"),
        count(lit(1)).as("n_events"),
        sum(floor(col(valueCol) * 100 + 0.5).cast("long"))
          .as("monetary_cents"))
    def tier(df: DataFrame, dim: String, as: String): DataFrame =
      Quantiles.globalNtile(df, dim, "key", tiers)
        .withColumnRenamed("bucket", as)
    val scored = tier(tier(tier(perKey,
      "last_ts_ms", "r_score"),
      "n_events", "f_score"),
      "monetary_cents", "m_score")
    scored.withColumn("rfm",
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .cast("int"))
  }

  /** First-touch attribution: each conversion event gets the EARLIEST
    * `touchType` event by the same key within the trailing `windowMs`
    * (inclusive of the conversion instant) — the classic marketing
    * question asofJoin's last-before semantics can't answer.
    *
    * The credit window is a value-based RANGE frame `[-windowMs, 0]` over
    * the key's millisecond timeline — exact, tie-stable (the frame is
    * value-defined, so same-ms rows agree in any engine), and ONE keyed
    * window exchange regardless of history depth.
    *
    * Output: one row per conversion —
    * (keyCol, idCol, conv_ms, first_touch_ms, gap_ms);
    * first_touch_ms/gap_ms NULL when no touch fell in the window. */
  def firstTouchAttribution(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String, idCol: String, touchType: String,
      convType: String, windowMs: Long): DataFrame = {
    require(windowMs >= 0, s"windowMs must be non-negative: $windowMs")
    val w = Window.partitionBy("__k").orderBy(col("__ms"))
      .rangeBetween(-windowMs, 0)
    events
      .select(col(keyCol).as("__k"), col(typeCol).as("__t"),
        expr(s"unix_millis(`$tsCol`)").as("__ms"), col(idCol))
      .withColumn("__ft",
        min(when(col("__t") === touchType, col("__ms"))).over(w))
      .filter(col("__t") === convType)
      .select(col("__k").as(keyCol), col(idCol),
        col("__ms").as("conv_ms"), col("__ft").as("first_touch_ms"),
        (col("__ms") - col("__ft")).as("gap_ms"))
  }

  /** Per-transition latency profile: for every consecutive event pair
    * within a key's timeline, the millisecond gap grouped by the
    * (previous type → current type) TRANSITION and summarized with
    * exact disc percentiles — the funnel-latency generalization of
    * [[interArrivalStats]]: not "how fast do users act" but "how fast
    * do they move from cart to checkout specifically".
    *
    * Output per transition: (transition, n, p50, p90, p99) — gap
    * milliseconds, actual data values (disc semantics), transition
    * rendered as `prev->cur`.
    *
    * Scale: ONE keyed lag window (the [[sessionize]] exchange) produces
    * gaps and previous types together; the summary reuses
    * [[Quantiles.discPercentiles]]' distributed rank — no buffering
    * percentile aggregate. Transition cardinality is |types|²-bounded. */
  def transitionLatency(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__ms"), col(idCol))
    val gaps = events
      .select(col(keyCol).as("__k"), col(typeCol).as("__t"),
        expr(s"unix_millis(`$tsCol`)").as("__ms"), col(idCol))
      .withColumn("__gap", col("__ms") - lag("__ms", 1).over(w))
      .withColumn("__prev", lag("__t", 1).over(w))
      .filter(col("__gap").isNotNull)
      .withColumn("transition",
        concat(col("__prev"), lit("->"), col("__t")))
    Quantiles.discPercentiles(
      gaps, "transition", "__gap", idCol, Seq(0.5, 0.9, 0.99))
  }

  /** CUSUM changepoint detection over each key's bucketed event volume —
    * the level-shift question the trailing-window z-test
    * ([[graft.operators.Stats.volumeAnomalies]]) can't answer: a z-test
    * flags one-bucket SPIKES, CUSUM finds the bucket where the mean
    * permanently MOVED (a feed going half-dark, a bot fleet switching
    * on). With per-key bucket counts c_1..c_m (bucket order) and total
    * T = Σc, the scaled cumulative deviation at bucket i is
    * `S_i = m·Σ_{j<=i} c_j − i·T` (the classic Σ(c_j − mean) cleared of
    * the division by m, so every term is an exact integer in
    * DECIMAL(38,0)); the changepoint estimate is the bucket maximizing
    * |S_i| — the standard CUSUM argmax — with ties to the EARLIEST
    * bucket, and `cusum_permille = 1000·|S|_max div (m·T)` is a pure
    * integer division (the normalized 0..~250 "how decisive" score;
    * a constant series scores 0). Keys with a single bucket or zero
    * total report a NULL changepoint (no interior point to split at).
    * S_m ≡ 0 by construction, so the argmax over i < m is taken by
    * excluding the last bucket.
    *
    * Buckets are OBSERVED buckets: an entirely silent bucket is absent
    * from the grid (compose with [[calendarFill]] first when silence
    * itself is the signal).
    *
    * Output per key: (key, n_buckets, total, cp_bucket, cusum_peak,
    * cusum_permille).
    *
    * Scale: the [[bucketCounts]] phase (ONE map-side-combined
    * aggregation — shared verbatim with
    * [[graft.streaming.EventStreams.streamingBucketCounts]], so the
    * streaming monitor folds its drained snapshot through
    * [[cusumFromBucketCounts]] for identical flags) collapses event
    * volume to the (key, bucket) grid; the running sum and argmax are
    * ONE keyed window over each key's BOUNDED bucket timeline (the
    * volumeAnomalies shape — buckets per key are calendar-bounded, so
    * no task ever sorts more than one key's timeline). */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String,
      bucketMs: Long): DataFrame =
    cusumFromBucketCounts(bucketCounts(events, keyCol, tsCol, bucketMs))

  /** Finish [[cusumChangepoint]] from a (key, bucket, n) count relation
    * — the shape [[graft.streaming.EventStreams.streamingBucketCounts]]
    * maintains as mergeable complete-mode state. */
  def cusumFromBucketCounts(counts: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val wRun = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = counts
      .withColumn("__cum", sum("n").over(wRun).cast(dec))
      .withColumn("__i", count(lit(1)).over(wRun).cast(dec))
      .withColumn("__t", sum("n").over(wAll).cast(dec))
      .withColumn("__m", count(lit(1)).over(wAll).cast(dec))
      .withColumn("__s",
        abs(col("__m") * col("__cum") - col("__i") * col("__t"))
          .cast(dec))
    scored
      .groupBy("key")
      .agg(max(col("__m")).as("__fm"), max(col("__t")).as("__ft"),
        max(when(col("__i") < col("__m"),
          struct(col("__s").as("s"), (-col("bucket")).as("negb"))))
          .as("__mx"))
      .select(col("key"),
        col("__fm").cast("long").as("n_buckets"),
        col("__ft").cast("long").as("total"),
        when(col("__mx").isNull || col("__ft") === 0,
          lit(null).cast("long"))
          .otherwise(-col("__mx.negb")).as("cp_bucket"),
        when(col("__mx").isNull || col("__ft") === 0,
          lit(null).cast("long"))
          .otherwise(col("__mx.s").cast("long")).as("cusum_peak"),
        when(col("__mx").isNull || col("__ft") === 0,
          lit(null).cast("long"))
          .otherwise(Quantiles.idiv(
            (col("__mx.s") * 1000).cast(dec),
            (col("__fm") * col("__ft")).cast(dec)))
          .as("cusum_permille"))
  }
}
