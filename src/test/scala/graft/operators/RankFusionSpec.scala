package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankFusionSpec extends SparkSpec {

  private val Q = 1000000000000L

  test("rrfFuse sums integer quanta and orders (rrf_q DESC, id)") {
    import spark.implicits._
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((12L, 1L), (10L, 2L), (13L, 3L)).toDF("id", "rank")
    val out = RankFusionOps.rrfFuse(a, b, "id", "rank", k = 60, topN = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    def c(rank: Long) = Q / (rank + 60)
    // 10: both lists (1,2) -> Q/61+Q/62; 12: both (3,1) -> Q/63+Q/61;
    // the (1,2) pair sums higher, so 10 leads
    val expect = Seq(
      (10L, c(1) + c(2), Some(1L), Some(2L)),
      (12L, c(3) + c(1), Some(3L), Some(1L)),
      (11L, c(2), Some(2L), None),
      (13L, c(3), None, Some(3L)))
    assert(out.toSeq == expect)
  }

  test("rrfFuse topN truncates after fusion, not before") {
    import spark.implicits._
    val a = (1L to 50L).map(i => (i, i)).toDF("id", "rank")
    val b = (1L to 50L).map(i => (100L + i, i)).toDF("id", "rank")
    val out = RankFusionOps.rrfFuse(a, b, "id", "rank", k = 60, topN = 4)
      .collect().map(_.getLong(0)).toSeq
    // equal quanta at the same rank: ties break id-ascending across lists
    assert(out == Seq(1L, 101L, 2L, 102L))
  }

  test("giniByGroup: equality, perfect concentration, all-zero") {
    import spark.implicits._
    val df = Seq(
      ("eq", 1L, 5L), ("eq", 2L, 5L), ("eq", 3L, 5L), ("eq", 4L, 5L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L), ("one", 4L, 20L),
      ("zero", 1L, 0L), ("zero", 2L, 0L)
    ).toDF("g", "doc_id", "v")
    val out = Stats.giniByGroup(df, "g", "v", "doc_id")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out("eq") == ((4L, 20L, 0.0)))
    // one-holder gini for n=4: (n-1)/n = 0.75
    assert(out("one") == ((4L, 20L,
      (2.0 * 80.0 - 5.0 * 20.0) / (4.0 * 20.0))))
    assert(out("one")._3 == 0.75)
    assert(out("zero") == ((2L, 0L, 0.0)))
  }

  test("giniByGroup matches the textbook formula on a mixed group") {
    import spark.implicits._
    val vals = Seq(1L, 2L, 3L, 4L, 10L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("m", i.toLong, v) }.toDF("g", "doc_id", "v")
    val out = Stats.giniByGroup(df, "g", "v", "doc_id").collect().head
    val sorted = vals.sorted
    val n = sorted.size
    val s = sorted.sum.toDouble
    val six = sorted.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum
    val expect = (2.0 * six - (n + 1.0) * s) / (n * s)
    assert(out.getDouble(3) == expect)
  }
}
