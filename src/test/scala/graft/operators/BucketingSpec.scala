package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with ZERO shuffle exchanges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket")
      .toString
    val facts = (0L until 5000L).map(i => (i % 400, i, (i * 7 % 100) / 10.0))
      .toDF("user_id", "event_id", "value")
    val dims = (0L until 400L).map(i => (i, s"seg${i % 7}"))
      .toDF("user_id", "segment")
    Bucketing.writeBucketed(facts, "b_facts", s"$dir/facts", 8, "user_id")
    Bucketing.writeBucketed(dims, "b_dims", s"$dir/dims", 8, "user_id")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path so the assertion targets the bucketed
    // merge, not a dim broadcast (broadcast would ALSO be shuffle-free)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketJoin(spark, "b_facts", "b_dims",
        Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point: no SHUFFLE exchange anywhere — each task merges
      // bucket i of both tables locally
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(!plan.contains("ShuffleExchange"), plan.take(1500))
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(plan.toLowerCase.contains("bucket"), plan.take(1500))
      // and the join is correct
      assert(joined.count() === 5000L)
      val check = joined.filter(col("user_id") === 13L)
        .select("segment").distinct().collect().map(_.getString(0))
      assert(check.toSeq === Seq("seg6"))
      // aggregation on the bucket key also avoids the exchange
      val agg = spark.table("b_facts").groupBy("user_id")
        .agg(sum("value"))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket2")
      .toString
    val a = (0L until 100L).map(i => (i, i * 2)).toDF("k", "va")
    val b = (0L until 100L).map(i => (i, i * 3)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "b_a", s"$dir/a", 4, "k")
    Bucketing.writeBucketed(b, "b_b", s"$dir/b", 6, "k")
    try {
      val j = Bucketing.bucketJoin(spark, "b_a", "b_b", Seq("k"))
      assert(j.count() === 100L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_a")
      spark.sql("DROP TABLE IF EXISTS b_b")
    }
  }
}
