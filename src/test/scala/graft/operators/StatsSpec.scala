package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  private def df(rows: Seq[(Double, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("x", "y", "z")
  }

  test("perfect linear relation gives corr 1 / -1; constants give 0") {
    val rows = (1 to 50).map(i => (i.toDouble, 2.0 * i, 7.0))
    val got = Stats.correlationMatrix(df(rows),
      Seq("x", "y", "z"), Seq(100L, 100L, 100L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6))
      .toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-9)
    assert(got(("x", "z")) === 0.0) // constant column -> guarded 0
    val anti = (1 to 50).map(i => (i.toDouble, -2.0 * i, 0.0))
    val g2 = Stats.correlationMatrix(df(anti),
      Seq("x", "y", "z"), Seq(100L, 100L, 100L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6))
      .toMap
    assert(math.abs(g2(("x", "y")) + 1.0) < 1e-9)
  }

  test("matches a naive double Pearson within quantization error") {
    val rows = (0 until 400).map { i =>
      (math.sin(i * 0.1) * 10 + i * 0.01,
        math.cos(i * 0.1) * 5 + i * 0.02, (i % 7).toDouble)
    }
    val got = Stats.correlationMatrix(df(rows),
      Seq("x", "y", "z"), Seq(10000L, 10000L, 10000L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6))
      .toMap
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val num = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val da = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val db = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      num / (da * db)
    }
    val xs = rows.map(_._1); val ys = rows.map(_._2); val zs = rows.map(_._3)
    assert(math.abs(got(("x", "y")) - pearson(xs, ys)) < 1e-4)
    assert(math.abs(got(("x", "z")) - pearson(xs, zs)) < 1e-4)
    assert(math.abs(got(("y", "z")) - pearson(ys, zs)) < 1e-4)
  }

  test("momentsTable q is exact where LONG sum(c*c) would wrap") {
    import spark.implicits._
    // cents c ~ 1.23e10 -> c*c ~ 1.5e20 > Long.MaxValue: a LONG q wraps
    // on the FIRST row; the DECIMAL(38,0) aggregation must match a BigInt
    // replay digit for digit.
    val vals = Seq(123456789.0, 123456790.5, 123456795.25, 98765432.1)
    val docs = vals.map(("g", _)).toDF("g", "v")
    val row = Stats.momentsTable(docs, "g", "v").collect().head
    val cents = vals.map(v => BigInt(math.floor(v * 100 + 0.5).toLong))
    assert(row.getLong(1) === vals.length.toLong)
    assert(BigInt(row.getDecimal(2).toBigInteger) === cents.sum)
    assert(BigInt(row.getDecimal(3).toBigInteger) ===
      cents.map(c => c * c).sum)
    // and the wrap is real: a LONG accumulation lands on a different value
    assert(BigInt(cents.map(c => (c * c).toLong).sum) !=
      cents.map(c => c * c).sum)
  }

  test("zScoreOutliers is exact on wrap-inducing magnitudes") {
    import spark.implicits._
    // one group of huge values with a single far outlier; driver replay
    // in BigInt must agree with the engine's DECIMAL path
    val base = (1 to 40).map(i => 100000000.0 + i)
    val vals = base :+ 900000000.0
    val docs = vals.map(("g", _)).toDF("g", "v")
    val got = Stats.zScoreOutliers(docs, "g", "v", kPermille = 3000L)
      .collect().head
    val cents = vals.map(v => BigInt(math.floor(v * 100 + 0.5).toLong))
    val n = BigInt(cents.length); val s = cents.sum
    val q = cents.map(c => c * c).sum
    val expected = cents.count { c =>
      val d = c * n - s
      d * d * BigInt(1000000) > BigInt(3000L * 3000L) * (n * q - s * s)
    }
    assert(got.getLong(1) === vals.length.toLong)
    assert(got.getLong(2) === expected.toLong)
    assert(expected === 1)
  }

  test("bit-identical at any partitioning") {
    val rows = (0 until 300).map(i =>
      ((i * 31 % 97).toDouble, (i * 17 % 89).toDouble, (i % 13).toDouble))
    val a = Stats.correlationMatrix(df(rows),
      Seq("x", "y", "z"), Seq(100L, 100L, 100L)).collect().map(_.toSeq).toSet
    val b = Stats.correlationMatrix(df(rows).repartition(11),
      Seq("x", "y", "z"), Seq(100L, 100L, 100L)).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
