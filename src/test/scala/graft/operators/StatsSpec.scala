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

  test("volumeAnomalies flags a spike after history, never cold-start") {
    import spark.implicits._
    // flat 10s then a 100 spike; first rows lack history
    val daily = ((1L to 8L).map(d => ("a", d, 10L)) :+ ("a", 9L, 100L))
      .toDF("g", "day", "n")
    val out = Stats.volumeAnomalies(daily, "g", "day", "n",
        lookback = 7, minHistory = 4L, kPermille = 3000L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(out(9L), "the 10x spike must flag")
    assert((1L to 8L).forall(!out(_)),
      "flat history and cold-start days must not flag: " + out)
  }

  test("volumeAnomalies: zero-variance history flags any deviation") {
    import spark.implicits._
    val daily = ((1L to 5L).map(d => ("a", d, 7L)) :+ ("a", 6L, 8L))
      .toDF("g", "day", "n")
    val out = Stats.volumeAnomalies(daily, "g", "day", "n")
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    // variance term is 0, so (c*n - s)^2 * 1e6 > 0 flags any c != mean
    assert(out(6L))
  }

  test("abTestReport: clear effect flags, balanced and degenerate do not") {
    import spark.implicits._
    // g: 9/10 vs 1/10 (z^2 = 12.8) ; h: 5/10 vs 5/10 (D = 0) ;
    // i: B arm empty
    val units =
      ((1 to 10).map(i => ("g", false, i <= 9)) ++
        (1 to 10).map(i => ("g", true, i <= 1)) ++
        (1 to 10).map(i => ("h", false, i <= 5)) ++
        (1 to 10).map(i => ("h", true, i <= 5)) ++
        (1 to 4).map(i => ("i", false, i <= 2)))
        .toDF("grp", "variant_b", "converted")
    val out = Stats.abTestReport(units, "grp", "variant_b", "converted")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(7))).toMap
    assert(out("g") == ((10L, 10L, 9L, 1L, true)))
    assert(out("h") == ((10L, 10L, 5L, 5L, false)))
    assert(out("i") == ((4L, 0L, 2L, 0L, false)), "empty arm never flags")
    val gRow = Stats.abTestReport(units, "grp", "variant_b", "converted")
      .filter(org.apache.spark.sql.functions.col("grp") === "g")
      .collect()(0)
    assert(gRow.getDouble(5) === 0.9 && gRow.getDouble(6) === 0.1)
  }

  test("trendByGroup recovers an exact line and nulls degenerate spreads") {
    import spark.implicits._
    // g1: y = 3x + 7 exactly; g2: one x value repeated -> den = 0
    val pts = (1L to 10L).map(x => ("g1", x, 3 * x + 7)) ++
      Seq(("g2", 5L, 1L), ("g2", 5L, 9L))
    val out = Stats.trendByGroup(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out("g1") == ((10L, Some(3.0), Some(7.0))))
    assert(out("g2") == ((2L, None, None)))
  }

  test("trendByGroup slope matches a driver closed-form replay") {
    import spark.implicits._
    val pts = Seq(("g", 1L, 5L), ("g", 2L, 9L), ("g", 4L, 6L),
      ("g", 7L, 20L))
    val out = Stats.trendByGroup(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    val (n, sx, sy) = (4.0, 14.0, 40.0)
    val (sxy, sxx) = (5.0 + 18 + 24 + 140, 1.0 + 4 + 16 + 49)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out.getDouble(2) == slope)
    assert(out.getDouble(3) == (sy - slope * sx) / n)
  }

  test("wilsonRanking: small perfect sample does not outrank a large one") {
    import spark.implicits._
    val docs = (1 to 2).map(_ => ("tiny", true)) ++
      (1 to 1000).map(i => ("big", i <= 950))
    val out = Stats.wilsonRanking(docs.toDF("g", "p"), "g", "p")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out("tiny")._1 == 2L && out("tiny")._2 == 2L)
    assert(out("big")._3 > out("tiny")._3,
      s"950/1000 must outrank 2/2: $out")
    // the exact chain value for the 2/2 group
    val (n, z) = (2.0, 1.96)
    val p = 1.0
    val z2 = z * z
    val expect = (p + z2 / (n * 2.0) -
      z * math.sqrt(p * (1.0 - p) / n + z2 / (n * n * 4.0))) /
      (1.0 + z2 / n)
    assert(out("tiny")._3 == expect)
  }
}
