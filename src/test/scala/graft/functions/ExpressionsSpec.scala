package graft.functions

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {

  test("reverse_complement expression matches scala impl, incl. codegen path") {
    import spark.implicits._
    val inputs = Seq("ACGT", "AACG", "acgtN", "", "ACGUacgu", "XYZ")
    val df = inputs.toDF("s")
      .select(col("s"), GraftFunctions.reverseComplement(col("s")).as("rc"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach { s =>
      assert(got(s) == GenomicFunctions.reverseComplement(s), s"input '$s'")
    }
    // and through the real codegen path: a range-backed plan isn't
    // constant-folded into a LocalTableScan, so doGenCode must run
    val gen = spark.range(64)
      .select(concat(lit("ACGTN"), col("id").cast("string")).as("s"))
      .select(col("s"), GraftFunctions.reverseComplement(col("s")).as("rc"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(gen.queryExecution.executedPlan.toString.contains("*(1) Project"))
    gen.collect().foreach { r =>
      assert(r.getString(1) == GenomicFunctions.reverseComplement(r.getString(0)))
    }
  }

  test("fnv1a64 expression matches scala impl") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "Ω≈ç√ unicode")
    val got = inputs.toDF("s")
      .select(col("s"), GraftFunctions.fnv1a64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) == DedupOps.fnv1a64(s), s"input '$s'"))
  }

  test("SQL registration via GraftFunctions.register") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT reverse_complement('AACG') AS rc, fnv1a64('abc') AS h")
      .collect().head
    assert(r.getString(0) == "CGTT")
    assert(r.getLong(1) == DedupOps.fnv1a64("abc"))
  }

  test("extensions class injects functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(ext)
    // the injection list is consumed at session build; applying to a live
    // session goes through register() (same registry entries)
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    assert(s2.sql("SELECT reverse_complement('ACGT') AS rc")
      .collect().head.getString(0) == "ACGT")
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "s")
      .select(GraftFunctions.reverseComplement(col("s")).as("rc"),
        GraftFunctions.fnv1a64(col("s")).as("h"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
