package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Relational operator coverage (SURVEY.md §2.3, §2.5-2.7 mapped onto the
  * driver's TPC-H-ish tables): scan+filter+project with pushdown, hash/
  * broadcast joins, partial aggregation, windows, sort/limit, set ops,
  * semi/anti joins, rollup, multi-conditional single-pass agg (the flagstat
  * shape, FlagStat.scala:95-130), time-bucket windows and sessionization
  * over `events`.
  */
object RelationalQueries extends QuerySet {

  val queries: Seq[Query] = Seq(

    // TPC-H Q1 shape — partial+final hash agg, pushdown date filter.
    Query("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
            sum(tenthCents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("sum_disc_tc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_tc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")),

    // Filter + projection — Catalyst pushes both to the parquet scan.
    Query("q02_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-04-01").cast("timestamp") &&
            col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_linenumber"),
            cents(col("l_extendedprice")).as("price_cents"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS price_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1995-04-01' AND l_quantity < 10""")),

    // Multi-way join through the star schema (TPC-H Q5 shape): the two dims
    // broadcast, the fact-side joins shuffle on their keys.
    Query("q03_revenue_by_nation",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem"); val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        // customer is a dimension (~1/40 of lineitem): broadcast it like
        // nation/region so only the l ⋈ o shuffle remains
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            sum(tenthCents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("revenue_tc"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
        CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_tc,
        count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // Explicit broadcast-hash join of fact against a small dim.
    Query("q04_brand_volume",
      (s, dir) => {
        val l = t(s, dir, "lineitem"); val p = t(s, dir, "part")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT p_brand,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    // Window top-1 per group (deterministic tie-break on the unique key).
    Query("q05_top_order_per_customer",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            cents(col("o_totalprice")).as("price_cents"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
        FROM (SELECT *, row_number() OVER
          (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn = 1""")),

    // Running-sum window over a time ordering.
    Query("q06_running_quantity",
      (s, dir) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, 0)
        t(s, dir, "lineitem")
          .filter(col("l_suppkey") <= 20)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast("long")).over(w).as("running_qty"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(sum(CAST(l_quantity AS BIGINT)) OVER
          (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
        FROM lineitem WHERE l_suppkey <= 20""")),

    // Global sort + limit (top-k); tie-broken so the SET is deterministic.
    Query("q07_top_orders",
      (s, dir) => {
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
      },
      Some("""SELECT o_orderkey,
        CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""")),

    // DISTINCT (dropDuplicates).
    Query("q08_distinct_segments",
      (s, dir) => t(s, dir, "customer")
        .select("c_mktsegment", "c_nationkey").distinct(),
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")),

    // Relational set op: EXCEPT.
    Query("q09_nations_without_suppliers",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        val su = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
        c.except(su)
      },
      Some("""SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier""")),

    // Anti join (NOT EXISTS).
    Query("q10_customers_without_orders",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment""")),

    // ROLLUP grouping sets.
    Query("q11_rollup_flags",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n_items")),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        count(*) AS n_items
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // Scalar subquery + HAVING.
    Query("q12_above_avg_orders",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val stats = o.agg(
          sum(cents(col("o_totalprice"))).as("s"),
          count(lit(1)).as("n"))
        o.crossJoin(broadcast(stats))
          .filter(cents(col("o_totalprice")).cast("double") >
            col("s").cast("double") / col("n"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE CAST(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS DOUBLE) >
          (SELECT CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)
                  / count(*) FROM orders)
        GROUP BY o_orderpriority""")),

    // Single-pass multi-conditional aggregation — the flagstat shape
    // (reference FlagStat.scala:95-130: 2x13 metrics in one pass).
    Query("q13_lineitem_flagstat",
      (s, dir) => t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_total"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when(col("l_discount") >= 0.05, 1L).otherwise(0L)).as("n_discounted"),
        sum(when(col("l_quantity") >= 30, 1L).otherwise(0L)).as("n_bulk"),
        sum(when(col("l_tax") > 0.0, 1L).otherwise(0L)).as("n_taxed"),
        sum(when(col("l_returnflag") === "R" && col("l_quantity") >= 30, 1L)
          .otherwise(0L)).as("n_bulk_returned")),
      Some("""SELECT count(*) AS n_total,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        CAST(sum(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
        CAST(sum(CASE WHEN l_tax > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
        CAST(sum(CASE WHEN l_returnflag = 'R' AND l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk_returned
        FROM lineitem""")),

    // Tumbling time window over the events stream table (batch analog of
    // the Structured Streaming path, SURVEY.md §2.10).
    Query("q14_hourly_events",
      (s, dir) => t(s, dir, "events")
        .select(expr("unix_millis(ts) div 3600000").as("hour_bucket"),
          col("event_type"), col("value"))
        .groupBy("hour_bucket", "event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("sum_value_cents")),
      Some("""SELECT epoch_ms(ts) // 3600000 AS hour_bucket, event_type,
        count(*) AS n_events,
        CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1, 2""")),

    // Sliding time windows in batch (each event lands in two 1-hour
    // windows on a 30-minute slide — the streaming window() semantics).
    Query("q34_sliding_windows",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          explode(array(
            expr("unix_millis(ts) div 3600000 * 3600000"),
            expr("(unix_millis(ts) - 1800000) div 3600000 * 3600000 + 1800000")))
            .as("window_start_ms"))
        .groupBy("window_start_ms", "event_type")
        .agg(count(lit(1)).as("n_events")),
      Some("""SELECT window_start_ms, event_type, count(*) AS n_events FROM (
          SELECT event_type,
            epoch_ms(ts) // 3600000 * 3600000 AS window_start_ms FROM events
          UNION ALL
          SELECT event_type,
            (epoch_ms(ts) - 1800000) // 3600000 * 3600000 + 1800000 FROM events)
        GROUP BY window_start_ms, event_type""")),

    // rank / dense_rank / lag window functions with a unique tie-break.
    Query("q35_order_ranks",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("prev_cents",
            lag(cents(col("o_totalprice")), 1).over(w))
          .filter(col("rnk") <= 10)
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("rnk").cast("long").as("rnk"),
            col("drnk").cast("long").as("drnk"), col("prev_cents"))
      },
      Some("""SELECT o_orderpriority, o_orderkey,
          CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk, prev_cents
        FROM (SELECT o_orderpriority, o_orderkey,
          rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
          lag(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 1) OVER w AS prev_cents
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey ASC))
        WHERE rnk <= 10""")),

    // Gap-based sessionization (30-minute gap) — SURVEY.md §2.10 extension;
    // shares shape with CoverageDataset.collapse (CoverageDataset.scala:300).
    Query("q15_user_sessions",
      (s, dir) => Sessionize.sessions(
        t(s, dir, "events"), "user_id", "ts", "event_id", 1800L),
      Some("""WITH flagged AS (
          SELECT user_id, event_id, ts, epoch_ms(ts) // 1000 AS tsec,
            CASE WHEN lag(epoch_ms(ts) // 1000) OVER w IS NULL
                   OR epoch_ms(ts) // 1000 - lag(epoch_ms(ts) // 1000) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessioned AS (
          SELECT user_id, tsec,
            sum(new_session) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
          min(tsec) AS session_start, max(tsec) AS session_end,
          count(*) AS n_events
        FROM sessioned GROUP BY user_id, session_id""")),

    // As-of (backward) join: each purchase matched to the user's latest
    // view at-or-before it. The operator is the union-marker + ordered
    // carry composition (one shuffle); the oracle is the INDEPENDENT
    // per-purchase rank over qualifying views, so the two formulations
    // cross-check each other.
    Query("q71_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        graft.operators.Sessionize.asofJoin(
          p, v, Seq("user_id"), "ts", "ts",
          Seq("event_id", "ts", "value"), rightTieBreak = "event_id")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            expr("unix_millis(ts)").as("t_ms"),
            col("asof_event_id").as("view_id"),
            expr("unix_millis(asof_ts)").as("view_t_ms"),
            cents(col("asof_value")).as("view_value_cents"))
      },
      Some("""WITH p AS (
          SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'),
        v AS (
          SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'view'),
        m AS (
          SELECT p.event_id AS pe, v.event_id AS ve, v.ts AS vts,
            v.value AS vv,
            row_number() OVER (PARTITION BY p.event_id
              ORDER BY v.ts DESC, v.event_id DESC) AS rn
          FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
        SELECT p.user_id, p.event_id AS purchase_id, epoch_ms(p.ts) AS t_ms,
          m.ve AS view_id, epoch_ms(m.vts) AS view_t_ms,
          CAST(floor(m.vv*100 + 0.5) AS BIGINT) AS view_value_cents
        FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          ON m.pe = p.event_id""")),

    // Retention cohort matrix: users bucketed by first-event week, distinct
    // active users per (cohort, weeks since) — the classic growth-analytics
    // triangle. Two map-side-combined aggregations + a broadcastable
    // (user, cohort) join.
    Query("q73_retention_cohorts",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 604800000").as("wk"))
        val firsts = e.groupBy("user_id")
          .agg(min(col("wk")).as("cohort_week"))
        e.join(firsts, "user_id")
          .groupBy(col("cohort_week"),
            (col("wk") - col("cohort_week")).as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH e AS (
          SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
        f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id)
        SELECT f.cohort_week, e.wk - f.cohort_week AS weeks_since,
          CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM e JOIN f USING (user_id)
        GROUP BY f.cohort_week, e.wk - f.cohort_week""")),

    // Ordered conversion funnel view -> click -> purchase, each step
    // within 24h of the previous: per stage, the users whose first
    // qualifying event comes strictly after their previous stage time. No
    // windows, no event sorting — filter + min-agg + key join per stage.
    Query("q74_funnel",
      (s, dir) => graft.operators.Sessionize.funnelCounts(
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_millis(ts)").as("ms")),
        "user_id", "event_type", "ms",
        Seq("view", "click", "purchase"), maxGap = Some(86400000L)),
      Some("""WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        v AS (SELECT user_id, min(ms) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ms) AS t2 FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ms > v.t1
            AND e.ms <= v.t1 + 86400000 GROUP BY e.user_id),
        p AS (SELECT e.user_id FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ms > c.t2
            AND e.ms <= c.t2 + 86400000 GROUP BY e.user_id)
        SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_keys FROM v
        UNION ALL
        SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""")),

    // First-order Markov transition matrix over each user's time-ordered
    // event stream — "what happens next" path analysis. One keyed window
    // shuffle, then a map-side-combined count over the |types|²-bounded
    // matrix.
    Query("q85_event_transitions",
      (s, dir) => graft.operators.Sessionize.eventTransitions(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH nx AS (
          SELECT user_id, event_type AS from_type,
            lead(event_type) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          FROM events)
        SELECT from_type, to_type,
          CAST(count(*) AS BIGINT) AS n_transitions
        FROM nx WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type""")),

    // SCD2 validity intervals per user over the event-type attribute:
    // keep only change rows, date each version [valid_from, next change).
    // The point-in-time-correct feature table — composed with the q71
    // as-of join it gives leakage-free feature lookups (a fact joins the
    // version in effect AT its timestamp, never a future one).
    Query("q122_scd2_intervals",
      (s, dir) => graft.operators.Sessionize.scd2Intervals(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH e AS (
          |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
          |  FROM events),
          |m AS (SELECT user_id, event_type, ms, event_id,
          |    lag(event_type) OVER (
          |      PARTITION BY user_id ORDER BY ms, event_id) AS prev,
          |    row_number() OVER (
          |      PARTITION BY user_id ORDER BY ms, event_id) AS rn
          |  FROM e),
          |ch AS (SELECT user_id, event_type, ms, event_id FROM m
          |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
          |SELECT user_id, event_type,
          |  CAST(row_number() OVER (
          |    PARTITION BY user_id ORDER BY ms, event_id) AS INTEGER)
          |    AS version,
          |  ms AS valid_from_ms,
          |  lead(ms) OVER (
          |    PARTITION BY user_id ORDER BY ms, event_id) AS valid_to_ms
          |FROM ch""".stripMargin)),

    // Point-in-time feature join: the q122 SCD2 version table as-of-joined
    // (q71 machinery) to purchase facts at ms-1 — each fact reads the
    // attribute version in effect STRICTLY BEFORE it ("state when the
    // user purchased"), the leakage-free feature-lookup composition; a
    // fact whose user has no prior version keeps the null group.
    Query("q124_pit_feature_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val dim = graft.operators.Sessionize.scd2Intervals(
          ev, "user_id", "event_type", "ts", "event_id")
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            (expr("unix_millis(ts)") - 1L).as("ms"))
        graft.operators.Sessionize.asofJoin(
          facts, dim, Seq("user_id"), "ms", "valid_from_ms",
          Seq("event_type", "version"), rightTieBreak = "version")
          .groupBy(col("asof_event_type").as("attr_in_effect"))
          .agg(count(lit(1)).as("n_facts"),
            sum(col("asof_version").cast("long")).as("sum_version"))
      },
      Some("""WITH e AS (
          |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
          |  FROM events),
          |m AS (SELECT user_id, event_type, ms, event_id,
          |    lag(event_type) OVER (
          |      PARTITION BY user_id ORDER BY ms, event_id) AS prev,
          |    row_number() OVER (
          |      PARTITION BY user_id ORDER BY ms, event_id) AS rn
          |  FROM e),
          |ch AS (SELECT user_id, event_type, ms, event_id FROM m
          |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
          |ver AS MATERIALIZED (SELECT user_id, event_type,
          |    CAST(row_number() OVER (
          |      PARTITION BY user_id ORDER BY ms, event_id) AS BIGINT)
          |      AS version,
          |    ms AS valid_from_ms
          |  FROM ch),
          |f AS (SELECT user_id, event_id, ms - 1 AS ms FROM e
          |  WHERE event_type = 'purchase'),
          |j AS (SELECT f.event_id, v.event_type, v.version,
          |    row_number() OVER (PARTITION BY f.event_id
          |      ORDER BY v.valid_from_ms DESC, v.version DESC) AS rn
          |  FROM f JOIN ver v ON v.user_id = f.user_id
          |    AND v.valid_from_ms <= f.ms)
          |SELECT w.event_type AS attr_in_effect,
          |  CAST(count(*) AS BIGINT) AS n_facts,
          |  CAST(sum(w.version) AS BIGINT) AS sum_version
          |FROM f LEFT JOIN (SELECT event_id, event_type, version FROM j
          |                  WHERE rn = 1) w USING (event_id)
          |GROUP BY 1""".stripMargin)),

    // Exact per-type value percentiles (percentile_disc semantics — actual
    // data values, no interpolation arithmetic) via distributed rank, NOT
    // a buffering percentile aggregate: the group sort is a window
    // exchange, the post-window shuffle carries one candidate row per
    // (group, percentile).
    Query("q86_value_percentiles",
      (s, dir) => graft.operators.Quantiles.discPercentiles(
        t(s, dir, "events"), "event_type", "value", "event_id",
        Seq(0.5, 0.9, 0.99)),
      Some("""WITH r AS (
          SELECT event_type, value,
            row_number() OVER (
              PARTITION BY event_type ORDER BY value, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM events)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
          min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
            THEN value END) AS p50,
          min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
            THEN value END) AS p90,
          min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
            THEN value END) AS p99
        FROM r GROUP BY event_type""")),

    // Funnel latency: per step-transition, exact disc percentiles of the
    // time-to-convert among users who completed the q74 funnel — the
    // funnel stage tables composed with the q86 distributed-rank
    // percentile machinery, one plan.
    Query("q90_funnel_latency",
      (s, dir) => {
        val stages = graft.operators.Sessionize.funnelStages(
          t(s, dir, "events")
            .select(col("user_id"), col("event_type"),
              expr("unix_millis(ts)").as("ms")),
          "user_id", "event_type", "ms",
          Seq("view", "click", "purchase"), maxGap = Some(86400000L))
        val done = stages(2) // (user_id, t1, t2, t3)
        val gaps = done.select(col("user_id"),
            lit("1_view_to_click").as("step"),
            (col("t2") - col("t1")).as("gap_ms"))
          .unionByName(done.select(col("user_id"),
            lit("2_click_to_purchase").as("step"),
            (col("t3") - col("t2")).as("gap_ms")))
        graft.operators.Quantiles.discPercentiles(
          gaps, "step", "gap_ms", "user_id", Seq(0.5, 0.9))
      },
      Some("""WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        v AS (SELECT user_id, min(ms) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(v.t1) AS t1, min(e.ms) AS t2
          FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ms > v.t1
            AND e.ms <= v.t1 + 86400000 GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(c.t1) AS t1, min(c.t2) AS t2,
            min(e.ms) AS t3
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ms > c.t2
            AND e.ms <= c.t2 + 86400000 GROUP BY e.user_id),
        gaps AS (
          SELECT user_id, '1_view_to_click' AS step, t2 - t1 AS gap_ms FROM p
          UNION ALL
          SELECT user_id, '2_click_to_purchase', t3 - t2 FROM p),
        r AS (
          SELECT step, gap_ms,
            row_number() OVER (
              PARTITION BY step ORDER BY gap_ms, user_id) AS rn,
            count(*) OVER (PARTITION BY step) AS n
          FROM gaps)
        SELECT step, CAST(max(n) AS BIGINT) AS n,
          min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
            THEN gap_ms END) AS p50,
          min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
            THEN gap_ms END) AS p90
        FROM r GROUP BY step""")),

    // Bounded-history next-event training examples: each event labeled
    // with the up-to-3 event types that preceded it in its user's
    // timeline — the sequence→next-item supervision generator of
    // session-based recommendation. Frame capped at 3 ROWS per row, one
    // key exchange.
    Query("q129_next_event_examples",
      (s, dir) => Sessionize.nextEventExamples(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
        historyLen = 3),
      Some("""SELECT user_id, event_id,
          coalesce(string_agg(event_type, '>') OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '') AS history,
          event_type AS label
        FROM events""")),

    // Explicit salted skew join: orders (salted on its own key) against
    // the customer dim replicated once per salt — the pre-shuffle skew
    // fix for bucketed / shuffled-hash joins AQE cannot split. The result
    // must be EXACTLY the plain join (the oracle).
    Query("q130_salted_skew_join",
      (s, dir) => {
        val orders = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            cents(col("o_totalprice")).as("total_cents"))
        val cust = t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        graft.operators.SkewOps.saltedJoin(
          orders, cust, Seq("o_custkey"), "o_orderkey", salts = 8)
      },
      Some("""SELECT o_custkey, o_orderkey,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
          c_mktsegment
        FROM orders JOIN customer ON c_custkey = o_custkey""")),

    // Key-skew profile of the events fact on user_id: the "measure before
    // you salt" diagnostic — top-20 hottest keys with their share, global
    // totals alongside. One map-side-combined count + TakeOrdered head.
    Query("q133_key_skew",
      (s, dir) => graft.operators.SkewOps.keySkewReport(
        t(s, dir, "events"), "user_id", k = 20),
      Some("""WITH c AS (
          SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total_rows,
          count(*) AS n_keys FROM c)
        SELECT key, CAST(n AS BIGINT) AS n,
          CAST(n AS DOUBLE) / total_rows AS share, total_rows, n_keys
        FROM c, t ORDER BY n DESC, key LIMIT 20""")),

    // k-anonymity release audit on the customer table's quasi-identifier
    // pair (nation, market segment): classes below k=10, rows they
    // expose, and the risk rate — the tabular companion to PII redaction.
    Query("q140_k_anonymity",
      (s, dir) => graft.operators.PrivacyOps.kAnonymityReport(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10),
      Some("""WITH cls AS (
          SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
          FROM customer GROUP BY 1, 2),
        a AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
            CAST(count(*) AS BIGINT) AS n_classes,
            CAST(min(n) AS BIGINT) AS min_class_size,
            CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_small_classes,
            CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
              AS n_rows_at_risk
          FROM cls)
        SELECT n_rows, n_classes, min_class_size, n_small_classes,
          n_rows_at_risk,
          CAST(n_rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)
            AS risk_rate
        FROM a""")),

    // Per-event-type daily-volume drift: exact closed-form least-squares
    // slope/intercept over (epoch day, daily count) points — DECIMAL
    // numerator/denominator, one double chain each.
    Query("q141_event_trend",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            col("event_type"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        graft.operators.Stats.trendByGroup(daily, "event_type", "day", "n")
      },
      Some("""WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
            sum(day::HUGEINT) AS sx, sum(n::HUGEINT) AS sy,
            sum(day::HUGEINT * n::HUGEINT) AS sxy,
            sum(day::HUGEINT * day::HUGEINT) AS sxx
          FROM daily GROUP BY 1),
        b AS (SELECT event_type, n_points, sx, sy,
            n_points::HUGEINT * sxy - sx * sy AS num,
            n_points::HUGEINT * sxx - sx * sx AS den
          FROM a)
        SELECT event_type, n_points,
          CASE WHEN den = 0 THEN NULL
            ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
          CASE WHEN den = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE)
              - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                * CAST(sx AS DOUBLE))
              / CAST(n_points AS DOUBLE) END AS intercept
        FROM b""")),

    // Referential-integrity audit: orders rows whose o_custkey has no
    // customer — the FK half of the deequ-style quality family. Keys
    // only ever shuffle; the distinct dimension side broadcasts.
    Query("q144_fk_audit",
      (s, dir) => graft.operators.ProfileOps.fkAudit(
        t(s, dir, "orders"), t(s, dir, "customer"),
        "o_custkey", "c_custkey"),
      Some("""WITH c AS (SELECT o_custkey AS k FROM orders),
        p AS (SELECT DISTINCT c_custkey AS k FROM customer),
        f AS (SELECT c.k,
            CASE WHEN p.k IS NULL THEN 1 ELSE 0 END AS orphan
          FROM c LEFT JOIN p USING (k))
        SELECT CAST(count(*) AS BIGINT) AS n_child_rows,
          CAST(sum(orphan) AS BIGINT) AS n_orphans,
          CAST(sum(orphan) AS DOUBLE) / CAST(count(*) AS DOUBLE)
            AS orphan_rate
        FROM f""")),

    // Primary-key uniqueness audit on lineitem's nominal key — the
    // driver fixture plants real duplicate (orderkey, linenumber) pairs,
    // so the dup counts are live, not vacuous.
    Query("q145_pk_audit",
      (s, dir) => graft.operators.ProfileOps.pkAudit(
        t(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber")),
      Some("""WITH g AS (
          SELECT l_orderkey, l_linenumber, CAST(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1, 2),
        a AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
            CAST(count(*) AS BIGINT) AS n_keys,
            CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dup_keys,
            CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
              AS n_dup_rows
          FROM g)
        SELECT n_rows, n_keys, n_dup_keys, n_dup_rows,
          CAST(n_dup_rows AS DOUBLE) / CAST(n_rows AS DOUBLE) AS dup_rate
        FROM a""")),

    // Score-calibration curve: event value deciles (exact global NTILE,
    // the q132 parallel-sort plan) vs purchase rate per decile — the
    // reliability diagram that validates a ranking signal before it
    // gates a pipeline.
    Query("q146_calibration_curve",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_id"), col("value"),
          (col("event_type") === "purchase").as("pos"))
        graft.operators.Quantiles.calibrationCurve(
            ev, "value", "pos", "event_id", n = 10)
          .withColumn("bucket", col("bucket").cast("long"))
      },
      Some("""WITH b AS (SELECT (event_type = 'purchase') AS pos,
            ntile(10) OVER (ORDER BY value, event_id) AS bucket
          FROM events)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
          CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE) AS pos_rate
        FROM b GROUP BY 1""")),

    // Daily + trailing-7-day EXACT distinct actives (DAU/WAU): rolling
    // distinct is non-decomposable, so each distinct (user, day) pair
    // contributes FORWARD to the 7 window-ends it belongs to — cost
    // bounded at 7x the distinct pairs, never a per-day re-scan.
    Query("q147_rolling_actives",
      (s, dir) => graft.operators.Sessionize.rollingDistinctActives(
        t(s, dir, "events"), "user_id", "ts", windowDays = 7),
      Some("""WITH pairs AS MATERIALIZED (
          SELECT DISTINCT user_id AS k, epoch_ms(ts) // 86400000 AS day
          FROM events),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
          FROM pairs GROUP BY 1),
        ex AS (SELECT DISTINCT k, day + gs AS wday
          FROM pairs CROSS JOIN (SELECT unnest(range(0, 7)) AS gs)),
        wau AS (SELECT wday, CAST(count(*) AS BIGINT) AS rolling
          FROM ex GROUP BY 1)
        SELECT d.day, d.dau, w.rolling
        FROM dau d JOIN wau w ON w.wday = d.day""")),

    // Trailing-window volume anomaly flags on per-type daily counts —
    // the exact 128-bit z-test (momentsTable arithmetic) over a ROWS
    // [-7,-1] frame; cold-start rows (<4 trailing points) never flag.
    Query("q148_volume_anomalies",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        graft.operators.Stats.volumeAnomalies(
          daily, "event_type", "day", "n")
      },
      Some("""WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, day, n,
            count(n) OVER wf AS wn,
            sum(n::HUGEINT) OVER wf AS ws,
            sum(n::HUGEINT * n::HUGEINT) OVER wf AS wq
          FROM daily
          WINDOW wf AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT event_type, day, n,
          (wn >= 4 AND
           (n::HUGEINT * wn - ws) * (n::HUGEINT * wn - ws) * 1000000
             > 9000000 * (wn::HUGEINT * wq - ws * ws)) AS anomalous
        FROM m""")),

    // Retention triangle: cohort = each user's first active day; cell
    // (cohort, age) counts users of that cohort active age days later.
    Query("q149_retention_cohorts",
      (s, dir) => graft.operators.Sessionize.retentionCohorts(
        t(s, dir, "events"), "user_id", "ts"),
      Some("""WITH pairs AS MATERIALIZED (
          SELECT DISTINCT user_id AS k, epoch_ms(ts) // 86400000 AS day
          FROM events),
        coh AS (SELECT k, min(day) AS cohort_day FROM pairs GROUP BY 1)
        SELECT c.cohort_day, p.day - c.cohort_day AS age_days,
          CAST(count(*) AS BIGINT) AS n_active
        FROM pairs p JOIN coh c ON c.k = p.k GROUP BY 1, 2""")),

    // Calendar gap fill + forward fill on a sparse daily series (high-value
    // event peaks): every day in each type's span appears; unobserved days
    // carry the last peak forward and are flagged.
    Query("q150_calendar_fill",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("value") > 300)
          .select(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"),
            cents(col("value")).as("peak_cents"))
          .groupBy("event_type", "day")
          .agg(max("peak_cents").as("peak_cents"))
        graft.operators.TimeSeriesOps.calendarFill(
          daily, "event_type", "day", "peak_cents")
      },
      Some("""WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
            max(CAST(floor(value*100 + 0.5) AS BIGINT)) AS peak_cents
          FROM events WHERE value > 300 GROUP BY 1, 2),
        spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi
          FROM daily GROUP BY 1),
        cal AS (SELECT event_type, unnest(range(lo, hi + 1)) AS day
          FROM spans)
        SELECT c.event_type, c.day,
          last_value(d.peak_cents IGNORE NULLS)
            OVER (PARTITION BY c.event_type ORDER BY c.day) AS peak_cents,
          d.peak_cents IS NOT NULL AS observed
        FROM cal c LEFT JOIN daily d
          ON d.event_type = c.event_type AND d.day = c.day""")),

    // Weekly two-proportion A/B report: unit = (week, user), variant by
    // user parity, outcome = purchased that week; pooled z-test at 0.05
    // over exact counts (cross products in 128-bit, one IEEE double
    // comparison — see Stats.abTestReport's determinism contract).
    Query("q151_ab_test",
      (s, dir) => {
        val units = t(s, dir, "events")
          .select(expr("unix_millis(ts) div 604800000").as("week"),
            col("user_id"),
            (col("event_type") === "purchase").as("p"))
          .groupBy("week", "user_id").agg(max("p").as("converted"))
          .withColumn("variant_b", col("user_id") % 2 === 1)
        graft.operators.Stats.abTestReport(
          units, "week", "variant_b", "converted")
      },
      Some("""WITH units AS MATERIALIZED (
          SELECT epoch_ms(ts) // 604800000 AS week, user_id,
            max(event_type = 'purchase') AS converted
          FROM events GROUP BY 1, 2),
        u2 AS (SELECT week, user_id % 2 = 1 AS variant_b, converted
          FROM units),
        agg AS (SELECT week,
          CAST(sum(CASE WHEN NOT variant_b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(sum(CASE WHEN variant_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
          CAST(sum(CASE WHEN NOT variant_b AND converted THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
          CAST(sum(CASE WHEN variant_b AND converted THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
          FROM u2 GROUP BY 1)
        SELECT week, n_a, n_b, conv_a, conv_b,
          CASE WHEN n_a > 0
            THEN CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
          CASE WHEN n_b > 0
            THEN CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
          (abs(CAST(conv_a::HUGEINT * n_b - conv_b::HUGEINT * n_a AS DOUBLE))
             * sqrt(CAST(n_a + n_b AS DOUBLE)))
           > 1.96 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               * CAST(conv_a + conv_b AS DOUBLE)
               * CAST(n_a + n_b - conv_a - conv_b AS DOUBLE)) AS significant
        FROM agg""")),

    // Inter-arrival cadence profile: per event type, exact disc
    // percentiles of the millisecond gaps between each user's consecutive
    // events — one keyed lag window + the q86 distributed-rank summary.
    Query("q155_interarrival",
      (s, dir) => graft.operators.Sessionize.interArrivalStats(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type"),
      Some("""WITH g AS (
          SELECT event_type, event_id,
            epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
              PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
          FROM events),
        gg AS (SELECT * FROM g WHERE gap IS NOT NULL),
        r AS (SELECT event_type, gap,
            row_number() OVER (
              PARTITION BY event_type ORDER BY gap, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM gg)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
          min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
            THEN gap END) AS p50,
          min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
            THEN gap END) AS p90,
          min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
            THEN gap END) AS p99
        FROM r GROUP BY event_type""")),

    // Winsorization audit: exact disc p1/p99 cuts per type + the integer
    // clamp bookkeeping — the clip-or-not report before outlier handling.
    Query("q156_winsorize_audit",
      (s, dir) => graft.operators.Stats.winsorizeReport(
        t(s, dir, "events").select(col("event_type"),
          cents(col("value")).as("cents"), col("event_id")),
        "event_type", "cents", "event_id"),
      Some("""WITH v AS (
          SELECT event_type,
            CAST(floor(value*100 + 0.5) AS BIGINT) AS cents, event_id
          FROM events),
        r AS (SELECT event_type, cents,
            row_number() OVER (
              PARTITION BY event_type ORDER BY cents, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        cuts AS (SELECT event_type,
            min(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
              THEN cents END) AS lo_cut,
            min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
              THEN cents END) AS hi_cut
          FROM r GROUP BY 1)
        SELECT v.event_type, CAST(count(*) AS BIGINT) AS n,
          max(lo_cut) AS lo_cut, max(hi_cut) AS hi_cut,
          CAST(sum(CASE WHEN cents < lo_cut THEN 1 ELSE 0 END) AS BIGINT)
            AS n_low,
          CAST(sum(CASE WHEN cents > hi_cut THEN 1 ELSE 0 END) AS BIGINT)
            AS n_high,
          CAST(sum(cents) AS BIGINT) AS sum_cents,
          CAST(sum(greatest(least(cents, hi_cut), lo_cut)) AS BIGINT)
            AS sum_winsorized_cents
        FROM v JOIN cuts USING (event_type)
        GROUP BY 1""")),

    // Dyadic recency-weighted smoothing of per-type daily volumes — the
    // exactly-windowable EMA shape (integer num/den, one double division).
    Query("q157_dyadic_smooth",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        graft.operators.TimeSeriesOps.dyadicTrailingMean(
          daily, "event_type", "day", "n", window = 8)
      },
      Some {
        val lags = (1 to 7).map(j =>
          s"lag(n, $j) OVER (PARTITION BY event_type ORDER BY day) AS l$j")
          .mkString(",\n            ")
        val num = (1 to 7).map(j => s"coalesce(l$j * ${1L << (7 - j)}, 0)")
          .mkString(" + ")
        val den = (1 to 7).map(j =>
          s"CASE WHEN l$j IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END")
          .mkString(" + ")
        s"""WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        l AS (SELECT event_type, day, n,
            $lags
          FROM daily),
        s AS (SELECT event_type, day, n,
            CAST(n * 128 + $num AS BIGINT) AS num,
            CAST(128 + $den AS BIGINT) AS den
          FROM l)
        SELECT event_type, day, n, num, den,
          CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS smoothed
        FROM s"""
      }),

    // First-touch attribution: each purchase credits the EARLIEST view by
    // the same user within the trailing day — a value-based RANGE frame,
    // so same-instant rows agree in any engine.
    Query("q159_first_touch",
      (s, dir) => graft.operators.Sessionize.firstTouchAttribution(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
        touchType = "view", convType = "purchase", windowMs = 86400000L),
      Some("""WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
          FROM events),
        w AS (SELECT user_id, event_type, ms, event_id,
            min(CASE WHEN event_type = 'view' THEN ms END) OVER (
              PARTITION BY user_id ORDER BY ms
              RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW) AS ft
          FROM e)
        SELECT user_id, event_id, ms AS conv_ms, ft AS first_touch_ms,
          ms - ft AS gap_ms
        FROM w WHERE event_type = 'purchase'""")),

    // Population Stability Index: value-distribution drift between
    // even-week (reference) and odd-week (current) events — +1-smoothed
    // over the union support, per-bucket ln contribution quantized at 1e7
    // (the BM25 ln precedent).
    Query("q161_psi_drift",
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          ((expr("unix_millis(ts) div 604800000") % 2) === 1).as("is_cur"),
          expr("CAST(floor(value*100 + 0.5) AS BIGINT) div 500").as("vb"))
        graft.operators.CorpusCompareOps.psiReport(ev, "is_cur", "vb")
      },
      Some("""WITH e AS (
          SELECT (epoch_ms(ts) // 604800000) % 2 = 1 AS is_cur,
            CAST(floor(value*100 + 0.5) AS BIGINT) // 500 AS b
          FROM events),
        grid AS (SELECT b,
            CAST(sum(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS BIGINT)
              AS n_ref,
            CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT)
              AS n_cur
          FROM e GROUP BY 1),
        tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
            CAST(sum(n_cur) AS BIGINT) AS tc,
            CAST(count(*) AS BIGINT) AS nb FROM grid)
        SELECT b, n_ref, n_cur,
          CAST(floor(
            (CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE)
              - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE))
            * ln(CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE)
                / (CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE)))
            * 1e7 + 0.5) AS BIGINT) AS psi_q
        FROM grid, tot""")),

    // MAD robust outlier flags: exact disc medians twice (value, then
    // |x - med|), pure integer decision path — the robust counterpart of
    // the q113 z-test family, immune to threshold drag by wild values.
    Query("q163_mad_outliers",
      (s, dir) => graft.operators.Stats.madOutliers(
        t(s, dir, "events").select(col("event_type"),
          cents(col("value")).as("cents"), col("event_id")),
        "event_type", "cents", "event_id", kPermille = 3500L),
      Some("""WITH v AS (
          SELECT event_type,
            CAST(floor(value*100 + 0.5) AS BIGINT) AS cents, event_id
          FROM events),
        r1 AS (SELECT event_type, cents, event_id,
            row_number() OVER (
              PARTITION BY event_type ORDER BY cents, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n FROM v),
        med AS (SELECT event_type,
            min(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
              THEN cents END) AS med
          FROM r1 GROUP BY 1),
        d AS (SELECT v.event_type, cents, event_id, med,
            abs(cents - med) AS dev
          FROM v JOIN med USING (event_type)),
        r2 AS (SELECT event_type, dev,
            row_number() OVER (
              PARTITION BY event_type ORDER BY dev, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n FROM d),
        mad AS (SELECT event_type,
            min(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
              THEN dev END) AS mad
          FROM r2 GROUP BY 1)
        SELECT d.event_type, cents, event_id, d.med, mad.mad,
          abs(cents - d.med) * 1000 > 3500 * mad.mad AS is_out
        FROM d JOIN mad USING (event_type)""")),

    // Percent-rank score normalization per group — RANK tie semantics
    // (equal scores share a rank, no tie-break column needed), so the
    // (rank-1)/(n-1) int/int double is order-deterministic in any engine.
    Query("q164_percent_rank_norm",
      (s, dir) => graft.operators.Stats.percentRankNormalize(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            cents(col("value")).as("cents")),
        "event_type", "cents"),
      Some("""WITH v AS (
          SELECT event_id, event_type,
            CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_id, event_type, cents,
          CASE WHEN count(*) OVER (PARTITION BY event_type) = 1 THEN 0.0
            ELSE CAST(rank() OVER (
                  PARTITION BY event_type ORDER BY cents) - 1 AS DOUBLE)
              / CAST(count(*) OVER (PARTITION BY event_type) - 1 AS DOUBLE)
          END AS pct_rank
        FROM v""")),

    // Horizon (recrawl) dedup: a (type|user) page sighting is fresh only
    // when >1h after its previous sighting — chained gaps, the batch twin
    // of streaming dropDuplicatesWithinWatermark state expiry; one keyed
    // window exchange computes both the lag test and the epoch cumsum.
    Query("q165_horizon_dedup",
      (s, dir) => graft.operators.DedupOps.horizonDedup(
          t(s, dir, "events").select(
            concat(col("event_type"), lit("|"),
              col("user_id").cast("string")).as("page"),
            col("ts"), col("event_id")),
          "page", "ts", "event_id", horizonMs = 3600000L)
        .select(col("page"), col("event_id"), col("fresh"), col("epoch")),
      Some("""WITH e AS (
          SELECT event_type || '|' || CAST(user_id AS VARCHAR) AS page,
            epoch_ms(ts) AS ms, event_id
          FROM events),
        g AS (SELECT page, event_id, ms,
            ms - lag(ms) OVER (
              PARTITION BY page ORDER BY ms, event_id) AS gap
          FROM e),
        f AS (SELECT page, event_id, ms,
            (gap IS NULL OR gap > 3600000) AS fresh FROM g)
        SELECT page, event_id, fresh,
          CAST(sum(CASE WHEN fresh THEN 1 ELSE 0 END) OVER (
            PARTITION BY page ORDER BY ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
            AS BIGINT) AS epoch
        FROM f""")),

    // RFM user-value segmentation: exact per-user recency/frequency/spend,
    // each quintiled with the exact ANSI globalNtile (ascending + key
    // tie-break, so DuckDB's own ntile replays the tiers bit-for-bit);
    // rfm = r*100 + f*10 + m, "555" = best segment.
    Query("q173_rfm_scores",
      (s, dir) => graft.operators.Sessionize.rfmScores(
        t(s, dir, "events"), "user_id", "ts", "value", tiers = 5),
      Some("""WITH pk AS (
          SELECT user_id AS key, epoch_ms(max(ts)) AS last_ts_ms,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
              AS monetary_cents
          FROM events GROUP BY 1),
        sc AS (SELECT *,
            ntile(5) OVER (ORDER BY last_ts_ms, key) AS r,
            ntile(5) OVER (ORDER BY n_events, key) AS f,
            ntile(5) OVER (ORDER BY monetary_cents, key) AS m
          FROM pk)
        SELECT key, last_ts_ms, n_events, monetary_cents,
          CAST(r AS INT) AS r_score, CAST(f AS INT) AS f_score,
          CAST(m AS INT) AS m_score,
          CAST(r*100 + f*10 + m AS INT) AS rfm
        FROM sc"""))
  )
}
