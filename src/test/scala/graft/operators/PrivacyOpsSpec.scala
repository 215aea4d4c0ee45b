package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacyOpsSpec extends SparkSpec {

  test("kAnonymityReport counts small classes and exposed rows") {
    import spark.implicits._
    // classes: (a,x)=3, (a,y)=1, (b,x)=2 — with k=3 the last two are risky
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("nat", "seg")
    val r = PrivacyOps.kAnonymityReport(df, Seq("nat", "seg"), k = 3)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((6L, 3L, 1L, 2L, 3L)))
    assert(r.getDouble(5) == 3.0 / 6.0)
  }

  test("kAnonymityReport: fully anonymous table has zero risk") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("q", i % 2)).toDF("a", "b")
    val r = PrivacyOps.kAnonymityReport(df, Seq("a", "b"), k = 5)
      .collect().head
    assert(r.getLong(4) == 0L && r.getDouble(5) == 0.0)
  }

  test("smallClasses drills down below k in (n, quasi) order") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("nat", "seg")
    val out = PrivacyOps.smallClasses(df, Seq("nat", "seg"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "y", 1L), ("b", "x", 1L)))
  }
}
