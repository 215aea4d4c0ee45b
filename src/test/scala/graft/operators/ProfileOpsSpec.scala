package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {

  test("profileColumns: nulls, blanks, distincts on a hand fixture") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("  ")),
      (Some(2L), None), (None, Some("b"))
    ).toDF("id", "s")
    val out = ProfileOps.profileColumns(df, Seq("id", "s"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // id: 4 rows, 1 null, 2 distinct non-null, blanks 0 (non-string)
    assert(out("id") == ((4L, 1L, 2L, 0L)))
    // s: 1 null, 3 distinct ("a", "  ", "b"), 1 whitespace-only blank
    assert(out("s") == ((4L, 1L, 3L, 1L)))
  }

  test("fkAudit counts orphans including null child keys") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = ProfileOps.fkAudit(child, parent, "ck", "pk").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 2L)))
    assert(r.getDouble(2) == 0.5)
  }

  test("pkAudit counts duplicate keys and their rows") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L),
      (2L, 1L)).toDF("a", "b")
    val r = ProfileOps.pkAudit(df, Seq("a", "b")).collect().head
    // keys: (1,1)x2 (1,2)x1 (2,1)x3 -> 2 dup keys covering 5 rows
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 3L, 2L, 5L)))
    assert(r.getDouble(4) == 5.0 / 6.0)
  }

  test("profileColumns is a single-pass plan (one Aggregate, Expand)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"v${i % 7}")).toDF("id", "s")
    val plan = ProfileOps.profileColumns(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      "multi-column exact distinct must plan as one Expand: " +
        plan.take(400))
    // the source is scanned once, not once per column
    assert(plan.split("LocalTableScan").length <= 2, plan.take(600))
  }
}
