package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class SimilarityOpsSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
  }

  test("cosine of identical vector is 1; orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f)))
      .toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK returns true top-k") {
    val corpus = vecs(100, 8, seed = 1)
    val queries = vecs(3, 8, seed = 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val got = SimilarityOps.bruteForceTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    // manual ground truth
    val cRows = corpus.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val qRows = queries.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    qRows.foreach { case (qid, qv) =>
      val expect = cRows.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val mine = got.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      assert(mine == expect, s"query $qid")
    }
  }

  test("lshTopK rank-1 self-match and decent recall vs brute force") {
    val corpus = vecs(200, 16, seed = 3)
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val brute = SimilarityOps.bruteForceTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SimilarityOps.lshTopK(queries, corpus, 5, numBits = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // self-vector always lands in the same buckets -> rank 1 = self
    for (q <- 0L until 5L)
      assert(lsh.exists(t => t._1 == q && t._2 == 1 && t._3 == q), s"self $q")
    val lshSet = lsh.map(t => (t._1, t._3)).toSet
    val recall = (brute intersect lshSet).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("lshTopKAgainst on a persisted index equals lshTopK") {
    val corpus = vecs(150, 16, seed = 19)
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val direct = SimilarityOps.lshTopK(queries, corpus, 5, numBits = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // round-trip the signature index through parquet (the production shape)
    val path = tmpDir() + "/srp.parquet"
    SimilarityOps.srpSignatures(corpus, numBits = 16)
      .write.mode("overwrite").parquet(path)
    val loaded = spark.read.parquet(path)
    val viaIndex = SimilarityOps.lshTopKAgainst(queries, loaded, 5,
        numBits = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaIndex == direct)
  }

  test("cosineNearDuplicates finds planted near-identical pairs only") {
    import spark.implicits._
    val base = Array.fill(16)(new Random(7).nextFloat() * 2 - 1)
    val nearDup = base.clone(); nearDup(0) = nearDup(0) + 0.01f
    val opposite = base.map(-_)
    val rnd = new Random(8)
    val noise = (10L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = (Seq((0L, base), (1L, nearDup), (2L, opposite)) ++ noise)
      .toDF("id", "vec")
    val pairs = SimilarityOps.cosineNearDuplicates(df, "id", "vec", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("cosineNearDuplicates plan: shuffled block join, no collect/cartesian") {
    val df = vecs(80, 8, seed = 21)
    val plan = SimilarityOps.cosineNearDuplicates(df, "id", "vec", 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffle join over block pairs:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("lshNearDuplicates recovers exact pairs at high threshold") {
    import spark.implicits._
    val rnd = new Random(9)
    // 5 planted near-dup pairs + noise
    val planted = (0 until 5).flatMap { g =>
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val w = v.clone(); w(g) = w(g) + 0.005f
      Seq((g * 2L, v), (g * 2L + 1, w))
    }
    val noise = (100L until 160L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = (planted ++ noise).toDF("id", "vec")
    val exact = SimilarityOps.cosineNearDuplicates(df, "id", "vec", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.lshNearDuplicates(df, "id", "vec", 0.999,
      numBits = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical vectors agree on every SRP band -> full recall here,
    // and the cosine verify keeps precision exact
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
    assert(exact.size >= 5)
  }

  test("ivfTopK with nProbe == nCentroids equals brute force") {
    val corpus = vecs(150, 16, seed = 11)
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val brute = SimilarityOps.bruteForceTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = SimilarityOps.ivfTopK(queries, corpus, 5,
      nCentroids = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("ivfTopK partial probe keeps self-match and reasonable recall") {
    val corpus = vecs(200, 16, seed = 12)
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val brute = SimilarityOps.bruteForceTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SimilarityOps.ivfTopK(queries, corpus, 5,
      nCentroids = 16, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // the self vector's list is always probed (it IS its nearest list)
    for (q <- 0L until 5L)
      assert(ivf.exists(t => t._1 == q && t._2 == 1 && t._3 == q), s"self $q")
    val recall = (brute intersect ivf.map(t => (t._1, t._3)).toSet).size
      .toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("ivfTopKAgainst on a parquet round-tripped index equals ivfTopK") {
    val corpus = vecs(150, 16, seed = 23)
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val direct = SimilarityOps.ivfTopK(queries, corpus, 5,
        nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val dir = tmpDir()
    SimilarityOps.ivfCentroids(corpus, 16)
      .write.mode("overwrite").parquet(dir + "/cent.parquet")
    val cents = spark.read.parquet(dir + "/cent.parquet")
    SimilarityOps.ivfAssignments(corpus, cents)
      .write.mode("overwrite").parquet(dir + "/assigned.parquet")
    val assigned = spark.read.parquet(dir + "/assigned.parquet")
    val viaIndex = SimilarityOps.ivfTopKAgainst(queries, assigned, cents,
        5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaIndex == direct)
  }

  test("semanticDuplicates drops the higher-centroid-similarity twin") {
    import spark.implicits._
    val rnd = new Random(13)
    // 4 planted near-dup pairs + noise; every id appears exactly once in
    // the output, one member of each planted pair is dropped
    val planted = (0 until 4).flatMap { g =>
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val w = v.clone(); w(g) = w(g) + 0.004f
      Seq((g * 2L, v), (g * 2L + 1, w))
    }
    val noise = (100L until 160L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = (planted ++ noise).toDF("id", "vec")
    val out = SimilarityOps.semanticDuplicates(df, "id", "vec",
        nClusters = 8, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    assert(out.map(_._1).sorted.toSeq == (planted ++ noise).map(_._1).sorted)
    for (g <- 0 until 4) {
      val pair = out.filter(t => t._1 / 2 == g && t._1 < 100)
      // near-identical twins always share a cluster (their nearest
      // centroid is decided by essentially the same vector)
      assert(pair.map(_._2).distinct.length == 1, s"pair $g split")
      assert(pair.count(_._3) == 1, s"pair $g: exactly one member drops")
    }
    // noise vectors at threshold .999 never collide
    assert(out.filter(_._1 >= 100).forall(!_._3))
  }

  test("semanticDuplicates is partitioning-invariant and keeps the atypical member") {
    import spark.implicits._
    val df = vecs(120, 16, seed = 14)
    val a = SimilarityOps.semanticDuplicates(df, "id", "vec",
        nClusters = 8, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = SimilarityOps.semanticDuplicates(df.repartition(7), "id", "vec",
        nClusters = 8, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b)

    // victim rule cross-check against a driver-side replay
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- x.indices) {
        d += x(i).toDouble * y(i); na += x(i).toDouble * x(i)
        nb += y(i).toDouble * y(i)
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      if (nn == 0.0) 0.0 else d / nn
    }
    val cid = a.map(t => t._1 -> t._2).toMap
    // for every same-cluster pair above threshold, at least one member is
    // dropped, and nothing is dropped without such a witness pair
    val samePairs = for {
      (i, vi) <- rows; (j, vj) <- rows
      if i < j && cid(i) == cid(j) && cos(vi, vj) > 0.7
    } yield (i, j)
    val dropped = a.filter(_._3).map(_._1)
    samePairs.foreach { case (i, j) =>
      assert(dropped.contains(i) || dropped.contains(j),
        s"pair ($i,$j) above threshold, neither dropped")
    }
    // and nothing is dropped without a witness pair
    val witnessed = samePairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(dropped.subsetOf(witnessed))
  }

  /** Driver-side exact replay of the greedy MMR selection. */
  private def referenceMmr(
      cand: Seq[(Long, Seq[Double])], qv: Seq[Double], k: Int,
      lambda: Double, n: Int): Seq[(Int, Long)] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dotS = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dotS += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dotS / (math.sqrt(na) * math.sqrt(nb))
    }
    val pool = cand.map { case (id, v) => (id, v, cos(v, qv)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(n)
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]()
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    for (r <- 1 to k) {
      val remaining = pool.filter(c => !sel.exists(_._1 == c._1))
      if (remaining.nonEmpty) {
        val best = remaining.map { case (id, v, rel) =>
          val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
          (id, v, lambda * rel - (1.0 - lambda) * ms)
        }.minBy { case (id, _, sc) => (-sc, id) }
        sel += ((best._1, best._2)); out += ((r, best._1))
      }
    }
    out.toSeq
  }

  test("mmrSelect equals the driver replay and diversifies duplicates") {
    import spark.implicits._
    val rnd = new Random(11)
    val qv = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    // 5 near-copies of the query direction + 35 spread vectors: plain
    // top-k would return the 5 copies first; MMR must interleave
    val copies = (1L to 5L).map(i => (i,
      qv.map(x => x + (rnd.nextDouble() - 0.5) * 0.01)))
    val spread = (10L until 45L).map(i => (i,
      Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val cand = copies ++ spread
    val df = cand.map { case (id, v) => (id, v.toArray) }.toDF("id", "vec")
    val got = SimilarityOps.mmrSelect(df, qv, k = 8, lambda = 0.5,
      nCandidates = 40).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === referenceMmr(cand, qv, 8, 0.5, 40))
    // diversity: the 8 picks are NOT simply the 5 near-copies first
    val copyRanks = got.filter(_._2 <= 5L).map(_._1)
    assert(copyRanks.length < 5 || copyRanks.max > 5,
      s"picks were pure relevance order: ${got.toSeq}")
    // partition invariance
    val again = SimilarityOps.mmrSelect(df.repartition(7), qv, 8, 0.5, 40)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(again.toSeq === got.toSeq)
  }

  test("hardNegativesTopK: ranks only label-mismatched rows; matches brute force") {
    import spark.implicits._
    val rnd = new Random(17)
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 3).toInt))
    val df = rows.toDF("id", "vec", "label")
    val anchors = df.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("label").as("q_label"))
    val got = SimilarityOps.hardNegativesTopK(anchors, df, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3),
        r.getInt(4)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    rows.filter(_._1 < 4).foreach { case (qid, qv, ql) =>
      val expect = rows.filter(_._3 != ql)
        .map { case (id, v, l) => (id, l, cos(qv.toSeq, v.toSeq)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      assert(mine.map(_._3).toSeq === expect.map(_._1).toSeq, s"qid=$qid")
      // every returned negative really has a different label
      assert(mine.forall(m => m._4 != ql))
    }
  }

  test("mmrSelect rejects a non-integral id column loudly") {
    import spark.implicits._
    val df = Seq(("a", Array(1.0, 0.0)), ("b", Array(0.0, 1.0)))
      .toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.mmrSelect(df, Seq(1.0, 0.0), k = 1)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("mmrSelect rank 1 is the pure relevance argmax; k caps at pool") {
    import spark.implicits._
    val df = vecs(6, 8, seed = 3)
    val qv = df.filter(col("id") === 0)
      .select(col("vec").cast("array<double>"))
      .head.getSeq[Double](0).toSeq
    val rest = df.filter(col("id") =!= 0)
    val got = SimilarityOps.mmrSelect(rest, qv, k = 10, lambda = 0.7,
      nCandidates = 10).collect()
    assert(got.length === 5, "k beyond pool size returns the whole pool")
    val byRel = SimilarityOps.bruteForceTopK(
      df.filter(col("id") === 0).select(col("id").as("qid"),
        col("vec").as("qvec")),
      rest.select(col("id"), col("vec")), 1).collect().head.getLong(2)
    assert(got.head.getLong(1) === byRel)
  }
}
