package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Guards the driver-testdata contract (TESTDATA.md): whatever physical
  * parquet type the driver writes for `events.ts` (TIMESTAMP(NANOS) → Long
  * under nanosAsLong, or TIMESTAMP(MICROS, isAdjustedToUTC=false) →
  * TIMESTAMP_NTZ in Spark 4), `Tables.load` must hand downstream operators
  * a plain TimestampType column. Round 7 shipped with only the Long branch:
  * regenerated micros testdata read as NTZ, the shim skipped, and all six
  * events queries crashed at analysis (VERDICT r7 #1). */
class TablesSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d + "/events.parquet").exists())

  test("events.ts normalizes to TimestampType on every driver SF") {
    assert(sfDirs.nonEmpty, "no driver testdata present")
    sfDirs.foreach { dir =>
      val df = Tables.load(spark, dir, "events")
      val tsType = df.schema("ts").dataType
      assert(tsType == TimestampType, s"$dir/events.parquet: ts read as $tsType")
      // the column must also be usable by the time-analytics family
      val n = df.select(unix_millis(col("ts"))).limit(1).count()
      assert(n == 1)
    }
  }

  test("NTZ normalization is exact under the UTC session timezone") {
    // Write an NTZ column ourselves, reload through the same normalization
    // path, and check micros are preserved bit-for-bit.
    val out = tmpDir()
    spark.sql(
      "SELECT id, timestamp_ntz '2024-03-01 12:34:56.789012' AS ts FROM range(3)")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val raw = spark.read.parquet(s"$out/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val df = Tables.load(spark, out, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val micros = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSet
    // 2024-03-01T12:34:56.789012Z
    assert(micros == Set(1709296496789012L))
  }

  test("non-events tables pass through untouched") {
    sfDirs.headOption.foreach { dir =>
      val df = Tables.load(spark, dir, "lineitem")
      assert(!df.schema.fields.exists(_.name == "ts"))
      assert(df.limit(1).count() == 1)
    }
  }
}
