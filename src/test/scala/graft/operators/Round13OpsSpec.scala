package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 operators vs naive driver-side references: event-path
  * trigrams, per-group centroid drift, corpus growth curve, link-domain
  * graph, rendezvous sharding. */
class Round13OpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // eventPathTrigrams
  // ------------------------------------------------------------------

  test("eventPathTrigrams: chains never cross keys, ties deterministic, " +
      "top-k by count then path") {
    import spark.implicits._
    // user a: v,c,p,v  -> (v,c,p), (c,p,v); user b: v,c,p -> (v,c,p);
    // user c: x,y (too short — no trigram)
    val rows = Seq(
      ("a", 1L, "v"), ("a", 2L, "c"), ("a", 3L, "p"), ("a", 4L, "v"),
      ("b", 5L, "v"), ("b", 6L, "c"), ("b", 7L, "p"),
      ("c", 8L, "x"), ("c", 9L, "y"))
    val got = Sessionize.eventPathTrigrams(
        rows.toDF("u", "id", "t")
          .withColumn("ts", timestamp_millis(col("id") * 1000)),
        "u", "t", "ts", "id", k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(("v", "c", "p", 2L), ("c", "p", "v", 1L)))
  }

  // ------------------------------------------------------------------
  // sourceCentroidDrift
  // ------------------------------------------------------------------

  test("sourceCentroidDrift: a group at the corpus centroid scores ~1, " +
      "an opposed group scores -1; floorDiv centroids exact") {
    import spark.implicits._
    // groups g+ (vectors near (1,0)) and g- (vectors near (-1,0));
    // global centroid is (0,0)-ish — use asymmetric counts so it isn't
    // exactly zero (zero-norm would hit the 0.0 guard, also tested)
    val rows = Seq(
      ("g+", Array(1.0f, 0.0f)), ("g+", Array(1.0f, 0.0f)),
      ("g+", Array(1.0f, 0.2f)),
      ("g-", Array(-1.0f, 0.0f)), ("g-", Array(-1.0f, -0.2f)))
    val got = ClusteringOps.sourceCentroidDrift(
        rows.toDF("g", "embedding"), "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got("g+")._1 == 3L && got("g-")._1 == 2L)
    // global centroid leans positive-x -> g+ cosine > 0 > g- cosine
    assert(got("g+")._2 > 0.9, s"got ${got("g+")._2}")
    assert(got("g-")._2 < -0.9, s"got ${got("g-")._2}")
  }

  test("sourceCentroidDrift: zero-norm group centroid defines cosine 0") {
    import spark.implicits._
    val rows = Seq(
      ("z", Array(0.0f, 0.0f)),
      ("a", Array(1.0f, 1.0f)))
    val got = ClusteringOps.sourceCentroidDrift(
        rows.toDF("g", "embedding"), "g")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("z") == 0.0)
  }

  test("sourceCentroidDrift: floorDiv centroid matches kmeans' " +
      "Math.floorDiv on negative sums") {
    import spark.implicits._
    // one group, three vectors: sum = -1 per dim, n = 3 ->
    // floorDiv(-1, 3) = -1 (NOT 0, which truncating division gives);
    // with global == group centroid, cosine must be exactly 1.0
    val rows = Seq(
      ("g", Array(-3.0f / (1 << 20))), ("g", Array(1.0f / (1 << 20))),
      ("g", Array(1.0f / (1 << 20))))
    val got = ClusteringOps.sourceCentroidDrift(
        rows.toDF("g", "embedding"), "g")
      .collect()
    assert(got.head.getDouble(2) == 1.0)
  }

  // ------------------------------------------------------------------
  // corpusGrowthCurve
  // ------------------------------------------------------------------

  test("corpusGrowthCurve: new vs re-seen fingerprints per day, " +
      "cumulative distinct; normalization shared with exact dedup") {
    import spark.implicits._
    // day 0: A, B      -> 2 new
    // day 1: a (dup of A via normalization), C -> 1 new, 2 distinct
    // day 2: B, B      -> 0 new, 1 distinct, 2 sightings
    val rows = Seq(
      (0L, "Doc A"), (0L, "doc b"),
      (1L, " doc  a "), (1L, "doc C"),
      (2L, "doc B"), (2L, "DOC B"))
    val got = SnapshotOps.corpusGrowthCurve(
        rows.toDF("day", "text"), "text", "day")
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 2L, 2L),
      (1L, 2L, 2L, 1L, 3L),
      (2L, 2L, 1L, 0L, 3L)))
  }

  // ------------------------------------------------------------------
  // linkDomainEdges / topLinkedDomains
  // ------------------------------------------------------------------

  test("linkDomainEdges: absolute hrefs only, host extraction strips " +
      "userinfo/port, per-doc and per-link counts") {
    import spark.implicits._
    val rows = Seq(
      ("s1", 1L, """<a href="https://A.com/x">1</a>
        <a href='http://user@a.com:8080/y?q=1'>2</a>
        <a href="/relative">3</a> <a href="mailto:x@y.z">4</a>
        <a href="https://b.com/#frag">5</a>"""),
      ("s1", 2L, """<a HREF = "https://a.com/z">6</a>"""),
      ("s2", 3L, """<a href="https://b.com/w">7</a>"""))
    val edges = WebOps.linkDomainEdges(
      rows.toDF("dom", "doc_id", "html"), "dom", "html", "doc_id")
    val got = edges.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // doc 1: a.com twice (case + userinfo/port variants), b.com once;
    // doc 2: a.com once; relative/mailto excluded
    assert(got(("s1", "a.com")) == (3L, 2L), got.toString)
    assert(got(("s1", "b.com")) == (1L, 1L))
    assert(got(("s2", "b.com")) == (1L, 1L))
    assert(got.size == 3)
    val top = WebOps.topLinkedDomains(edges, 1).collect().head
    assert(top.getString(0) == "a.com" && top.getLong(1) == 3L &&
      top.getLong(3) == 1L) // one src domain links a.com
  }

  // ------------------------------------------------------------------
  // rendezvousShard / rendezvousMoveReport
  // ------------------------------------------------------------------

  test("rendezvousShard: matches the driver argmax replay; resize " +
      "moves only keys whose new shards win") {
    import spark.implicits._
    val keys = (0 until 500).map(_.toLong)
    val df = keys.toDF("k")
    def replay(k: Long, n: Int): Int =
      (0 until n).maxBy(s => (DedupOps.splitmix64(
        DedupOps.fnv1a64(k.toString) + s * 0x9e3779b97f4a7c15L), s))
    val got = df.select(col("k"),
        ShardOps.rendezvousShard(col("k"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    keys.foreach(k => assert(got(k) == replay(k, 8), s"key $k"))
    // grow 8 -> 10: a key moves iff its 10-shard winner is shard 8/9;
    // expected moved fraction 2/10
    val rep = ShardOps.rendezvousMoveReport(df, "k", 8, 10).collect().head
    val expectMoved = keys.count(k => replay(k, 10) >= 8)
    assert(rep.getLong(0) == 500L)
    assert(rep.getLong(1) == expectMoved)
    assert(rep.getLong(2) == expectMoved * 1000L / 500L)
    // sanity: in the expected band around 20% (theory: (m-n)/m)
    assert(rep.getLong(1) > 50 && rep.getLong(1) < 150, rep.toString)
  }

  test("rendezvousMoveReport: same shard count moves nothing; dedupes " +
      "repeated keys") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 2L, 3L).toDF("k")
    val rep = ShardOps.rendezvousMoveReport(df, "k", 16, 16)
      .collect().head
    assert(rep.getLong(0) == 3L && rep.getLong(1) == 0L &&
      rep.getLong(2) == 0L)
  }
}
