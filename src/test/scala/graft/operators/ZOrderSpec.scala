package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (known 2-dim values)") {
    import spark.implicits._
    // bits 4 per dim, bounds [0, 15]: z(x, y) = classic Morton code
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (15.0, 15.0),
      (5.0, 10.0)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")),
      Seq(0.0, 0.0), Seq(15.0, 15.0), bitsPerDim = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(x: Int, y: Int) =
      (0 until 4).map(j => (((x >> j) & 1) << (2 * j)) |
        (((y >> j) & 1) << (2 * j + 1))).sum.toLong
    assert(z == Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(15, 15), morton(5, 10)))
  }

  test("zValue handles nulls, NaN and degenerate bounds") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 3.0), (Double.NaN, 3.0), (7.0, 3.0)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")),
      Seq(0.0, 3.0), Seq(10.0, 3.0), bitsPerDim = 4).as("z")) // y constant
      .collect().map(_.getLong(0))
    assert(z.forall(_ >= 0L))
  }

  test("writeZOrdered clusters BOTH dimensions into narrow per-file ranges") {
    import spark.implicits._
    // 4096 rows on a 64x64 grid in random order
    val rnd = new scala.util.Random(5)
    val rows = rnd.shuffle((0 until 64).flatMap(a =>
      (0 until 64).map(b => (a.toLong, b.toLong)))).toSeq
    val df = rows.toDF("a", "b").repartition(8)
    val out = tmpDir() + "/z.parquet"
    ZOrder.writeZOrdered(df, out, Seq("a", "b"), numFiles = 16,
      bitsPerDim = 6)
    val back = spark.read.parquet(out)
    assert(back.count() == 4096)
    // per-file spread on each dimension must beat the global spread by a
    // wide margin — that is the whole point of the curve
    val files = back.select(input_file_name().as("f"), col("a"), col("b"))
      .groupBy("f")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .collect()
    assert(files.length > 4)
    val avgA = files.map(_.getLong(1)).sum.toDouble / files.length
    val avgB = files.map(_.getLong(2)).sum.toDouble / files.length
    assert(avgA < 32, s"dim a not clustered: avg spread $avgA of 63")
    assert(avgB < 32, s"dim b not clustered: avg spread $avgB of 63")
  }

  test("a plain sort clusters only the leading dimension (the contrast)") {
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    val rows = rnd.shuffle((0 until 64).flatMap(a =>
      (0 until 64).map(b => (a.toLong, b.toLong)))).toSeq
    val out = tmpDir() + "/sorted.parquet"
    rows.toDF("a", "b").repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite").parquet(out)
    val files = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("b"))
      .groupBy("f").agg((max("b") - min("b")).as("sb")).collect()
    val avgB = files.map(_.getLong(1)).sum.toDouble / files.length
    // the secondary column spans (nearly) its whole range per file
    assert(avgB > 50, s"expected unclustered secondary dim, got $avgB")
  }
}
