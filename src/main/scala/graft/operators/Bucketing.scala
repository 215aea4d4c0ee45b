package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style bucketed table layout — the storage-side half of the
  * co-located-join story ([[ZOrder]] is the scan-pruning half).
  *
  * Writing both sides of a hot recurring join bucketed (and bucket-sorted)
  * on the join key lets Spark's bucketing rule plan the join with ZERO
  * shuffle exchanges and (with sorted buckets) zero sorts: each task reads
  * bucket i of both tables and merges. At 100 TB this converts every
  * repeated fact-to-fact join (events to user features, reads to targets)
  * from a full-corpus exchange into a task-local merge — the shuffle is
  * paid ONCE at layout time, amortized over every downstream join.
  * BucketingSpec asserts the physical plan of a bucket join carries no
  * Exchange. Bucket counts should be sized so a bucket of the larger
  * table fits a task comfortably (n ≈ table_bytes / 256 MB, rounded to a
  * power of two so that doubling either table re-buckets cleanly).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table at `path`, registered
    * as `table` in the session catalog (parquet; overwrite). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, key: String, moreKeys: String*): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi join of two same-bucketed tables on their bucket key — plans
    * shuffle-free when both were written by [[writeBucketed]] with the
    * same bucket count and key. */
  def bucketJoin(spark: SparkSession, tableA: String, tableB: String,
      keys: Seq[String]): DataFrame =
    spark.table(tableA).join(spark.table(tableB), keys)
}
