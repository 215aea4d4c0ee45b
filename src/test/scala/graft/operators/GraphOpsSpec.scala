package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class GraphOpsSpec extends SparkSpec {

  /** Driver-side replay of the exact integer-PageRank recurrence — the
    * distributed loop must match it value-for-value. */
  private def referencePageRank(
      edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = 3L * scale / 20L
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val msgs = scala.collection.mutable.Map[Long, Long]()
      edges.foreach { case (s, d) =>
        msgs(d) = msgs.getOrElse(d, 0L) + rank(s) / outdeg(s)
      }
      rank = nodes.map(n => n -> (teleport + 17L * msgs.getOrElse(n, 0L) / 20L)).toMap
    }
    rank
  }

  private def toDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  test("pageRank equals the driver-side integer replay on a ring + chords") {
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12))
    val chords = Seq((0L, 6L), (3L, 9L), (6L, 0L), (9L, 3L), (1L, 0L), (5L, 0L))
    val edges = ring ++ chords
    val got = GraphOps.pageRank(toDf(edges), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referencePageRank(edges, 5, 1000000000L))
  }

  test("star graph: the hub out-ranks every spoke") {
    // undirected star: hub 0 <-> spokes 1..8
    val edges = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L)))
    val ranks = GraphOps.pageRank(toDf(edges), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(0L)
    (1L to 8L).foreach(i => assert(hub > ranks(i)))
    assert(got6Digits(ranks), "every rank positive and bounded")
    def got6Digits(m: Map[Long, Long]): Boolean =
      m.values.forall(v => v > 0L && v < 9L * 1000000000L)
  }

  test("pageRank is bit-identical at any partition count") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 40), ((i * 7 + 1) % 40, i)))
    val a = GraphOps.pageRank(toDf(edges), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = GraphOps.pageRank(toDf(edges).repartition(13), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("coOccurrenceEdges: distinct symmetric pairs, no self-loops") {
    import spark.implicits._
    val inc = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), // dup item in same basket
      (2L, 10L), (2L, 13L),
      (3L, 14L)) // singleton basket -> no edges
      .toDF("basket", "item")
    val got = GraphOps.coOccurrenceEdges(inc, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set(
      (10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L), (11L, 12L), (12L, 11L),
      (10L, 13L), (13L, 10L))
    assert(got === expected)
  }

  test("coOccurrenceEdges equals the naive self-join formulation (r16 rewrite)") {
    import spark.implicits._
    // random-ish incidence with duplicate (basket, item) rows, singleton
    // baskets and items shared across baskets
    val inc = (0L until 200L).flatMap { i =>
      val basket = i % 37
      Seq((basket, i % 11), (basket, (i * 7 + 3) % 11), (basket, i % 11))
    }.toDF("basket", "item")
    val got = GraphOps.coOccurrenceEdges(inc, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = inc.select(col("basket").as("k"), col("item").as("src"))
    val b = inc.select(col("basket").as("k"), col("item").as("dst"))
    val naive = a.join(b, "k").filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
  }

  test("triangleCounts equals brute force on a random-ish graph") {
    val edges = (0L until 30L).flatMap { i =>
      val j = (i * 7 + 3) % 30
      val k = (i * 11 + 5) % 30
      Seq((i, j), (j, i), (i, k), (k, i))
    }.filter { case (a, b) => a != b }
    val got = GraphOps.triangleCounts(toDf(edges))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a < b }.distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val triPerNode = nodes.map { n =>
      val nb = adj(n).toSeq
      n -> (for {
        i <- nb.indices; j <- (i + 1) until nb.length
        if adj(nb(i)).contains(nb(j))
      } yield 1).size.toLong
    }.toMap
    nodes.foreach { n =>
      val (t, d, num, den) = got(n)
      assert(t === triPerNode(n), s"node $n")
      assert(d === adj(n).size.toLong)
      assert(num === 2 * t && den === d * (d - 1))
    }
  }

  test("triangleCounts: K4 gives every node 3 triangles, coefficient 1") {
    val k4 = for {
      a <- 0L until 4L; b <- 0L until 4L if a != b
    } yield (a, b)
    val got = GraphOps.triangleCounts(toDf(k4)).collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getLong(1) === 3L) // triangles
      assert(r.getLong(2) === 3L) // degree
      assert(r.getLong(3) === r.getLong(4)) // 2T == deg(deg-1) -> coeff 1
    }
  }

  test("kCoreByMedianDegree equals a driver-side peel replay") {
    val edges = ((0L until 20L).flatMap { i =>
      val j = (i * 3 + 1) % 20
      Seq((i, j), (j, i))
    } ++ // a dense clique that must survive the peel
      (for { a <- 30L to 36L; b <- 30L to 36L if a != b } yield (a, b)))
      .distinct
    val rounds = 4
    val got = GraphOps.kCoreByMedianDegree(toDf(edges), rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    var e = edges.toSet
    val deg0 = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg0.size
    val k = deg0.toSeq.map { case (nd, d) => (d, nd) }.sorted
      .apply((n + 1) / 2 - 1)._1
    for (_ <- 0 until rounds) {
      val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter { case (s, d) => keep(s) && keep(d) }
    }
    val ref = e.groupBy(_._1).map { case (nd, es) =>
      (nd, es.size.toLong, k)
    }.toSet
    assert(got === ref)
    // the 7-clique (degree 6 each) survives
    assert((30L to 36L).forall(nd => got.exists(_._1 == nd)))
  }

  test("median gate: histogram rank equals a full (deg, node) sort") {
    // the cumulative-histogram median must equal the value at rank
    // (n+1)/2 of the fully sorted (deg, node) list on arbitrary degree
    // multisets, including heavy ties and singleton lists
    val cases = Seq(
      Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L),
      Seq(7L),
      Seq(2L, 2L, 2L, 2L),
      Seq(1L, 1L, 2L, 3L, 3L, 3L, 3L, 10L, 10L),
      (0L until 101L).map(i => (i * 37) % 11 + 1))
    cases.foreach { degs =>
      val hist = degs.groupBy(identity).view.mapValues(_.size.toLong)
        .toArray.sortBy(_._1)
      val sorted = degs.sorted
      val expected = sorted((degs.size + 1) / 2 - 1)
      assert(GraphOps.medianFromHistogram(hist) === expected, degs)
    }
  }

  test("k-core plans: no window sort anywhere — histogram gate + keyed peels") {
    val edges = (0L until 30L).flatMap(i => Seq((i, (i * 7 + 1) % 30),
      ((i * 7 + 1) % 30, i)))
    val histPlan = GraphOps.degreeHistogram(toDf(edges))
      .queryExecution.executedPlan.toString
    assert(!histPlan.contains("Window"), histPlan.take(600))
    assert(histPlan.contains("partial_count"),
      "histogram must map-side combine")
    val corePlan = GraphOps.kCoreByMedianDegree(toDf(edges), rounds = 2)
      .queryExecution.executedPlan.toString
    assert(!corePlan.contains("Window"), corePlan.take(600))
  }

  test("pageRankTopK: deterministic (rank desc, node asc) prefix") {
    val edges = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L)))
    val top = GraphOps.pageRankTopK(toDf(edges), iters = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = GraphOps.pageRank(toDf(edges), iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (n, rq) => (-rq, n) }
    assert(top.toSeq === all.take(3).toSeq)
  }

  /** Driver-side replay of the deterministic LPA recurrence. */
  private def referenceLpa(
      edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 0 until rounds) {
      lbl = nodes.map { v =>
        val counts = edges.filter(_._1 == v).map(e => lbl(e._2))
          .groupBy(identity).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lbl
  }

  test("labelPropagation equals the driver replay; two cliques separate") {
    // two 4-cliques joined by one bridge edge: LPA should settle each
    // clique on its own min label
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L), (10L, 4L))
    val got = GraphOps.labelPropagation(toDf(edges), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceLpa(edges, 4))
    assert(Seq(1L, 2L, 3L).forall(n => got(n) == 1L))
    assert(Seq(11L, 12L, 13L).forall(n => got(n) == 10L))
  }

  test("labelPropagation is bit-identical at any partition count") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
      .flatMap(e => Seq(e, e.swap)).distinct
    val a = GraphOps.labelPropagation(toDf(edges), 4)
      .collect().map(_.toSeq).toSet
    val b = GraphOps.labelPropagation(toDf(edges).repartition(13), 4)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a === referenceLpa(edges, 4).map { case (n, l) => Seq(n, l) }.toSet)
  }

  test("labelPropagation symmetrizes a directed edge list (dst-only nodes)") {
    // a directed path 1->2->3: nodes 2 and 3 appear only as dst in part;
    // the operator must seed and vote them as if edges were undirected
    val directed = Seq((1L, 2L), (2L, 3L))
    val sym = directed.flatMap(e => Seq(e, e.swap)).distinct
    val got = GraphOps.labelPropagation(toDf(directed), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got === referenceLpa(sym, 4))
  }

  test("labelPropagationCommunities: sizes sum to node count, ordered") {
    val edges = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L))) ++
      Seq((20L, 21L), (21L, 20L))
    val comm = GraphOps.labelPropagationCommunities(toDf(edges), 4, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comm.map(_._2).sum === 11L)
    val ordered = comm.sortBy { case (c, n) => (-n, c) }
    assert(comm.toSeq === ordered.toSeq)
  }
}
