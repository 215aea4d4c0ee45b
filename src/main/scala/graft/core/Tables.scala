package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst owns predicate
  * pushdown / column pruning / partition discovery — see SURVEY.md §2.1
  * (reference: adam-core ADAMContext.loadParquet, ADAMContext.scala:1814-1857,
  * where pushdown/projection are hand-plumbed; here they are free).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 only reads via
    // spark.sql.legacy.parquet.nanosAsLong (set in Verify/Bench/test
    // sessions). Normalize back to TimestampType at microsecond precision
    // so downstream operators see a timestamp everywhere.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's naming (SURVEY.md §7 step 4). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
