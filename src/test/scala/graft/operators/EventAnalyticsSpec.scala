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
}
