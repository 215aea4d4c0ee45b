package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** fanOut contract: under-parallel inputs get hash-repartitioned to the
  * session's default parallelism before compute-heavy narrow stages;
  * already-parallel inputs pass through untouched (the 100 TB no-op). */
class ParallelismSpec extends SparkSpec {

  test("under-parallel input is fanned out to default parallelism") {
    val one = spark.range(1000).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val fanned = Parallelism.fanOut(one, col("id"))
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("already-parallel input passes through with no added exchange") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).toDF("id")
      .repartition(target + 2, col("id"))
    val out = Parallelism.fanOut(wide, col("id"))
    assert(out.rdd.getNumPartitions == target + 2)
    // identity, not just same-count: no second Exchange in the plan
    assert(out.queryExecution.optimizedPlan ==
      wide.queryExecution.optimizedPlan)
  }

  test("plans with an upstream shuffle pass through without a probe") {
    // Probing .rdd on a shuffling plan would EXECUTE its stages under AQE;
    // fanOut must return such plans untouched (reference-identical).
    val agg = spark.range(1000).toDF("id")
      .groupBy(col("id") % 7).count()
    assert(Parallelism.fanOut(agg, col("count")) eq agg)
  }

  test("fanned-out computation matches the serial result") {
    val docs = spark.range(100)
      .select(col("id"),
        concat(lit("the quick brown fox jumps over a lazy dog number "),
          col("id")).as("text"))
      .coalesce(1)
    val serial = DedupOps.exactSubstrDedupReport(
      docs.repartition(8, col("id")), "id", "text", minLen = 12)
    val fanned = DedupOps.exactSubstrDedupReport(docs, "id", "text", minLen = 12)
    assert(fanned.orderBy("id").collect().toSeq ==
      serial.orderBy("id").collect().toSeq)
  }
}
