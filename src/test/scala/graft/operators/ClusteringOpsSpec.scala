package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringOpsSpec extends SparkSpec {

  private val Scale = ClusteringOps.DefaultScale

  /** Driver-side reference implementation of the exact same fixed-point
    * Lloyd algorithm (quantize, splitmix init, argmin ties->lowest ci,
    * floorDiv means, empty clusters carry) — the distributed fit must
    * match it exactly on any input. */
  private def referenceFit(
      rows: Seq[(Long, Seq[Float])], k: Int, iters: Int): Array[Array[Long]] = {
    val q = rows.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * Scale + 0.5).toLong).toArray)
    }
    var cents = q.sortBy { case (id, _) => (DedupOps.splitmix64(id), id) }
      .take(k).map(_._2.map(identity)).toArray
    def assign(qv: Array[Long]): Int = {
      var best = 0; var bestD = Long.MaxValue
      for (ci <- cents.indices) {
        var d = 0L
        for (i <- cents(ci).indices) { val t = qv(i) - cents(ci)(i); d += t * t }
        if (d < bestD) { bestD = d; best = ci }
      }
      best
    }
    for (_ <- 0 until iters) {
      val byC = q.groupBy { case (_, qv) => assign(qv) }
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byC.get(ci) match {
          case None => old.clone()
          case Some(members) =>
            old.indices.map { d =>
              Math.floorDiv(members.map(_._2(d)).sum, members.size.toLong)
            }.toArray
        }
      }
    }
    cents
  }

  private def mkDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Deterministic pseudo-random vectors (no RNG — hash-derived). */
  private def synth(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { d =>
        val h = DedupOps.splitmix64(i.toLong * 131 + d)
        ((h & 0xffff) / 65536.0f) - 0.5f
      })
    }

  test("kmeansFit matches the driver-side reference implementation") {
    val rows = synth(200, 8)
    val fitted = ClusteringOps.kmeansFit(mkDf(rows), k = 5, iters = 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).map(_._2)
    val expect = referenceFit(rows, k = 5, iters = 3)
    assert(fitted.length == expect.length)
    fitted.zip(expect).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("fit is partitioning-independent (fixed-point determinism)") {
    val rows = synth(300, 6)
    def fit(parts: Int) = ClusteringOps.kmeansFit(
      mkDf(rows).repartition(parts), k = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    assert(fit(1) == fit(7))
  }

  test("Lloyd rounds do not increase the quantized objective") {
    val rows = synth(250, 8)
    def objective(iters: Int): Long = {
      val cents = ClusteringOps.kmeansFit(mkDf(rows), k = 4, iters = iters)
        .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1).map(_._2)
      rows.map { case (_, v) =>
        val qv = v.map(x => math.floor(x.toDouble * Scale + 0.5).toLong).toArray
        cents.map { c =>
          c.indices.map { i => val t = qv(i) - c(i); t * t }.sum
        }.min
      }.sum
    }
    val objs = (0 to 3).map(objective)
    objs.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(objs.last < objs.head) // it actually moved on this data
  }

  test("duplicate init points: losing centroid keeps its position") {
    // three distinct points, k=4 -> at least two init centroids coincide;
    // ties assign to the lowest ci, so the duplicate never wins a point
    // and must carry its init position through every round.
    val base = Seq(
      Seq.fill(4)(0.1f), Seq.fill(4)(0.2f), Seq.fill(4)(0.3f))
    val rows = (0 until 12).map(i => (i.toLong, base(i % 3)))
    val fitted = ClusteringOps.kmeansFit(mkDf(rows), k = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).map(_._2)
    val expect = referenceFit(rows, k = 4, iters = 2)
    fitted.zip(expect).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("kmeansAssign agrees with the reference assignment; probe plan has no shuffle") {
    val rows = synth(100, 8)
    val df = mkDf(rows)
    val centDf = ClusteringOps.kmeansFit(df, k = 3, iters = 2)
    val got = ClusteringOps.kmeansAssign(df, centDf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val cents = referenceFit(rows, k = 3, iters = 2)
    rows.foreach { case (id, v) =>
      val qv = v.map(x => math.floor(x.toDouble * Scale + 0.5).toLong).toArray
      val exp = cents.zipWithIndex.minBy { case (c, ci) =>
        (c.indices.map { i => val t = qv(i) - c(i); t * t }.sum, ci)
      }._2
      assert(got(id) == exp, s"vec $id")
    }
    val plan = ClusteringOps.kmeansAssign(df, centDf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe should be narrow:\n$plan")
  }

  test("centroidsAsFloat plugs into the IVF probe shape") {
    val rows = synth(80, 8)
    val df = mkDf(rows)
    val cents = ClusteringOps.centroidsAsFloat(
      ClusteringOps.kmeansFit(df, k = 3, iters = 1))
    assert(cents.columns.toSeq == Seq("ci", "cvec"))
    val assigned = SimilarityOps.ivfAssignments(
      df.select(col("vec_id").as("id"), col("embedding").as("vec")), cents)
    assert(assigned.count() == 80)
    assert(assigned.select("cid").distinct().count() <= 3)
  }

  // ------------------------------ PCA -------------------------------------

  /** Driver-side replay of the exact fixed-point pipeline: quantize,
    * truncating-division mean, Gram, power iteration, projection. */
  private def referencePca(
      rows: Seq[(Long, Int, Seq[Float])], iters: Int): Map[Int, (Long, Long, Long, Long)] = {
    val s = ClusteringOps.PcaScale
    val q = rows.map { case (id, lab, v) =>
      (id, lab, v.map(x => math.floor(x.toDouble * s + 0.5).toLong).toArray)
    }
    val dim = q.head._3.length
    val n = q.size.toLong
    val mean = Array.tabulate(dim)(d => q.map(_._3(d)).sum / n)
    val c = q.map { case (id, lab, qv) =>
      (id, lab, Array.tabulate(dim)(d => qv(d) - mean(d)))
    }
    val g = Array.tabulate(dim, dim)((a, b) => c.map(r => r._3(a) * r._3(b)).sum)
    val axis = ClusteringOps.powerIteration(g, iters)
    c.groupBy(_._2).map { case (lab, rs) =>
      val ps = rs.map(r => (0 until dim).map(d => r._3(d) * axis(d)).sum)
      lab -> (rs.size.toLong, ps.sum / rs.size, ps.min, ps.max)
    }
  }

  private def synthEmbeddings(n: Int, dim: Int) = {
    import spark.implicits._
    // two linearly separated label blobs along a planted direction
    (0 until n).map { i =>
      val lab = i % 2
      val v = Array.tabulate(dim) { d =>
        val noise = (((i * 31 + d * 7) % 17) - 8) / 40.0f
        (if (d < 4) (if (lab == 0) 0.4f else -0.4f) else 0.0f) + noise
      }.toSeq
      (i.toLong, lab, v)
    }
  }

  test("pcaLabelProjection equals the driver-side fixed-point replay") {
    import spark.implicits._
    val rows = synthEmbeddings(120, 16)
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = ClusteringOps.pcaLabelProjection(df, iters = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === referencePca(rows, 10))
  }

  test("pca separates planted label clusters and is partitioning-invariant") {
    import spark.implicits._
    val rows = synthEmbeddings(200, 16)
    val df = rows.toDF("vec_id", "label", "embedding")
    val a = ClusteringOps.pcaLabelProjection(df, iters = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // opposite signs along PC1 — the planted direction dominates
    assert(a(0).sign * a(1).sign === -1L,
      s"labels did not separate: $a")
    val b = ClusteringOps.pcaLabelProjection(df.repartition(7), iters = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("perceptronTrain equals a driver replay and learns a separable gate") {
    import spark.implicits._
    // y = (x1 >= 50) with a noisy second feature — separable on x1
    val rows = (1L to 300L).map { i =>
      val x1 = (i * 7) % 100
      val x2 = (i * 13) % 40 + 200
      (x1, x2, if (x1 >= 50) 1L else 0L)
    }
    val df = rows.toDF("x1", "x2", "y")
    val got = ClusteringOps.perceptronTrain(df, Seq("x1", "x2"), "y", 12)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // driver replay: integer means, pocket over 13 candidates
    val n = rows.size.toLong
    val m1 = rows.map(_._1).sum / n
    val m2 = rows.map(_._2).sum / n
    val feats = rows.map { case (a, b, y) => (Array(1L, a - m1, b - m2), y) }
    var w = Array(0L, 0L, 0L)
    var pocket = w; var pocketOk = -1L
    for (_ <- 1 to 12) {
      val preds = feats.map { case (x, _) =>
        if (x.zip(w).map(p => p._1 * p._2).sum > 0) 1L else 0L }
      val ok = feats.zip(preds).count { case ((_, y), p) => y == p }.toLong
      if (ok > pocketOk) { pocketOk = ok; pocket = w }
      val d = w.indices.map(j =>
        feats.zip(preds).map { case ((x, y), p) => (y - p) * x(j) }.sum)
      w = w.indices.map(j => w(j) + d(j)).toArray
    }
    val lastOk = feats.count { case (x, y) =>
      (if (x.zip(w).map(p => p._1 * p._2).sum > 0) 1L else 0L) == y }.toLong
    if (lastOk > pocketOk) { pocketOk = lastOk; pocket = w }
    assert(got.toSeq === Seq(
      ("bias", 0L, pocket(0), pocketOk, n),
      ("x1", m1, pocket(1), pocketOk, n),
      ("x2", m2, pocket(2), pocketOk, n)))
    // it actually learned: well above the base rate
    val base = math.max(rows.count(_._3 == 1L), rows.count(_._3 == 0L))
    assert(pocketOk > base, s"pocket $pocketOk vs base $base")
    // partition invariance
    val again = ClusteringOps.perceptronTrain(
      df.repartition(7), Seq("x1", "x2"), "y", 12)
      .collect().sortBy(_.getInt(0)).map(_.getLong(3))
    assert(again.toSeq === got.map(_._3).toSeq)
  }

  test("powerIteration converges to the dominant eigendirection") {
    // diag-dominant 3x3 with known principal axis ~ e2
    val g = Array(
      Array(2L, 0L, 0L),
      Array(0L, 5L, 1L),
      Array(0L, 1L, 90L))
    val v = ClusteringOps.powerIteration(g.map(_.map(_ * 1000000L)), iters = 12)
    val vd = v.map(_.toDouble)
    val norm = math.sqrt(vd.map(x => x * x).sum)
    assert(math.abs(vd(2) / norm) > 0.99, v.toSeq.toString)
    // sign convention: first nonzero component positive
    assert(v.find(_ != 0L).forall(_ > 0L))
  }
}
