package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the calendar-regularization operators. */
class TimeSeriesOpsSpec extends SparkSpec {

  test("calendarFill fills gaps per group and carries values forward") {
    import spark.implicits._
    val daily = Seq(("a", 1L, 10L), ("a", 4L, 40L), ("b", 7L, 70L))
      .toDF("g", "day", "v")
    val out = TimeSeriesOps.calendarFill(daily, "g", "day", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out == Map(
      ("a", 1L) -> ((10L, true)),
      ("a", 2L) -> ((10L, false)),   // gap: carries day-1 peak
      ("a", 3L) -> ((10L, false)),
      ("a", 4L) -> ((40L, true)),
      ("b", 7L) -> ((70L, true))))   // single-day group: no explosion
  }

  test("calendarFill output is dense: one row per day of each span") {
    import spark.implicits._
    val daily = Seq(("x", 100L, 1L), ("x", 110L, 2L)).toDF("g", "day", "v")
    val out = TimeSeriesOps.calendarFill(daily, "g", "day", "v")
    assert(out.count() == 11)
    assert(out.filter(col("observed")).count() == 2)
  }
}
