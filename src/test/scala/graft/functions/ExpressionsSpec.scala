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

  test("cosine_similarity expression: values, codegen path, SQL, nulls") {
    import spark.implicits._
    def ref(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val nn = math.sqrt(na) * math.sqrt(nb)
      if (nn == 0.0) 0.0 else d / nn
    }
    val rnd = new scala.util.Random(5)
    val rows = (0 until 50).map(_ =>
      (Seq.fill(16)(rnd.nextDouble() * 2 - 1), Seq.fill(16)(rnd.nextDouble() * 2 - 1))) ++
      Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)),   // identical
        (Seq(1.0, 0.0), Seq(0.0, 1.0)),     // orthogonal
        (Seq(0.0, 0.0), Seq(1.0, 1.0)))     // zero norm
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        GraftFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect()
    got.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(r.getDouble(2) == ref(a, b), s"bitwise mismatch for $a / $b")
    }
    // codegen path (range-backed, not constant-folded)
    val gen = spark.range(32)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(col("a"), col("b"),
        GraftFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
    assert(gen.queryExecution.executedPlan.toString.contains("*(1) Project"))
    gen.collect().foreach { r =>
      assert(r.getDouble(2) == ref(r.getSeq[Double](0), r.getSeq[Double](1)))
    }
    // SQL registry
    GraftFunctions.register(spark)
    val s = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect().head.getDouble(0)
    assert(s == 1.0)
    // nulls propagate
    val nr = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(GraftFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect().head
    assert(nr.isNullAt(0))
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
