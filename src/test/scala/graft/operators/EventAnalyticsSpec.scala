package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-8 event-analytics additions: Markov transitions and
  * distributed exact disc percentiles. */
class EventAnalyticsSpec extends SparkSpec {

  test("eventTransitions counts adjacent pairs per key in (ts, tie) order") {
    import spark.implicits._
    // user 1: a -> b -> a ; user 2: a -> a ; equal timestamps on user 3
    // break by event_id: (t=5,id=1,'x') then (t=5,id=2,'y')
    val e = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 20L), (1L, 3L, "a", 30L),
      (2L, 4L, "a", 10L), (2L, 5L, "a", 15L),
      (3L, 6L, "x", 5L), (3L, 7L, "y", 5L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessionize.eventTransitions(e, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "a") -> 1L,
      ("x", "y") -> 1L))
  }

  test("eventTransitions: single-event keys contribute nothing") {
    import spark.implicits._
    val e = Seq((1L, 1L, "a", 1L)).toDF("user_id", "event_id", "event_type", "ts")
    assert(Sessionize.eventTransitions(e, "user_id", "event_type",
      "ts", "event_id").count() == 0)
  }

  test("discPercentiles picks actual data values at ceil(p*n) rank") {
    import spark.implicits._
    // group g: values 1..10 -> p50 = 5th value = 5.0, p90 = 9th = 9.0,
    // p99 = ceil(9.9) = 10th = 10.0
    val df = (1 to 10).map(i => ("g", i.toLong, i.toDouble))
      .toDF("k", "id", "v")
    val row = Quantiles.discPercentiles(df, "k", "v", "id",
      Seq(0.5, 0.9, 0.99)).collect().head
    assert(row.getLong(1) == 10L)
    assert(row.getDouble(2) == 5.0)
    assert(row.getDouble(3) == 9.0)
    assert(row.getDouble(4) == 10.0)
  }

  test("discPercentiles: n=1 group and duplicate values") {
    import spark.implicits._
    val df = Seq(("a", 1L, 7.5), ("b", 2L, 3.0), ("b", 3L, 3.0),
      ("b", 4L, 9.0)).toDF("k", "id", "v")
    val out = Quantiles.discPercentiles(df, "k", "v", "id", Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("a") == ((1L, 7.5)))
    // b: sorted (3.0, 3.0, 9.0), p50 -> rank ceil(1.5)=2 -> 3.0
    assert(out("b") == ((3L, 3.0)))
  }

  test("scd2Intervals: change rows only, contiguous leak-free horizons") {
    import spark.implicits._
    // user 1: a a b b a (changes at 10, 30, 50); user 2: constant x;
    // user 3: equal timestamps tie-broken by event_id (y then z)
    val e = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "a", 20L), (1L, 3L, "b", 30L),
      (1L, 4L, "b", 40L), (1L, 5L, "a", 50L),
      (2L, 6L, "x", 10L), (2L, 7L, "x", 99L),
      (3L, 8L, "y", 5L), (3L, 9L, "z", 5L))
      .toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = Sessionize.scd2Intervals(e, "user_id", "event_type", "ts",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq === Seq(
      (1L, "a", 1, 10L, 30L), (1L, "b", 2, 30L, 50L), (1L, "a", 3, 50L, -1L),
      (2L, "x", 1, 10L, -1L),
      (3L, "y", 1, 5L, 5L), (3L, "z", 2, 5L, -1L)))
    // leak-free horizon contract: per user the versions tile the timeline
    // (valid_to(i) == valid_from(i+1), final horizon open) — so a
    // point-in-time lookup at any t hits exactly one version
    out.groupBy(_._1).foreach { case (_, vs) =>
      vs.sliding(2).foreach {
        case Array(a, b) => assert(a._5 === b._4)
        case _ =>
      }
      assert(vs.last._5 === -1L)
      assert(vs.map(_._3).toSeq === (1 to vs.length))
    }
  }

  test("point-in-time composition: asofJoin at t-1 reads the pre-fact version") {
    import spark.implicits._
    // user 1 history: a@10 b@30 a@50; facts at 30 (sees version a@10),
    // at 31 (sees b@30), at 5 (sees nothing -> null group)
    val e = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 30L), (1L, 3L, "a", 50L))
      .toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val dim = Sessionize.scd2Intervals(e, "user_id", "event_type", "ts",
      "event_id")
    val facts = Seq((1L, 100L, 30L), (1L, 101L, 31L), (1L, 102L, 5L))
      .toDF("user_id", "fact_id", "t")
      .select(col("user_id"), col("fact_id"), (col("t") - 1).as("ms"))
    val out = Sessionize.asofJoin(facts, dim, Seq("user_id"), "ms",
        "valid_from_ms", Seq("event_type", "version"), "version")
      .collect()
      .map(r => r.getAs[Long]("fact_id") ->
        (Option(r.getAs[String]("asof_event_type")),
          Option(r.getAs[Any]("asof_version"))))
      .toMap
    assert(out(100L)._1 === Some("a"), "fact at t=30 must NOT see b@30")
    assert(out(101L)._1 === Some("b"))
    assert(out(102L)._1 === None, "fact before any version keeps nulls")
  }

  test("rollingDistinctActives: dau and 7-day window by hand") {
    import spark.implicits._
    // users per day (epoch days 0..8): u1 every day, u2 only day 0,
    // u3 on days 0 and 8
    val ms = (d: Long) => d * 86400000L
    val ev = ((0L to 8L).map(d => (1L, ms(d))) :+ (2L, ms(0L)) :+
      (3L, ms(0L)) :+ (3L, ms(8L)))
      .toDF("user_id", "tsms")
      .withColumn("ts", timestamp_millis(col("tsms"))).drop("tsms")
    val out = graft.operators.Sessionize.rollingDistinctActives(
        ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(0L) == ((3L, 3L)))           // u1,u2,u3 that day
    assert(out(6L) == ((1L, 3L)))           // window [0..6] still sees all
    assert(out(7L) == ((1L, 1L)))           // u2/u3's day-0 aged out
    assert(out(8L) == ((2L, 2L)))           // u3 returns on day 8
    assert(out.size == 9)
  }

  test("retentionCohorts builds the triangle by hand") {
    import spark.implicits._
    val ms = (d: Long) => d * 86400000L
    // u1 active days 0,1,5; u2 days 1,3; u3 day 0 (twice - dedup)
    val ev = Seq((1L, ms(0)), (1L, ms(1)), (1L, ms(5)), (2L, ms(1)),
      (2L, ms(3)), (3L, ms(0)), (3L, ms(0) + 1000L))
      .toDF("user_id", "tsms")
      .withColumn("ts", timestamp_millis(col("tsms"))).drop("tsms")
    val out = Sessionize.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (0L, 0L) -> 2L,            // cohort day 0: u1 + u3
      (0L, 1L) -> 1L, (0L, 5L) -> 1L,   // u1 returns
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))  // u2's cohort
  }
}
