package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 fourth batch vs hand references: ranked-retrieval eval
  * (P@k / MRR / NDCG@k) and smoothed target encoding. */
class Round13dOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // rankedEval
  // ------------------------------------------------------------------

  test("rankedEval: hand DCG/IDCG from the embedded discount table, " +
      "MRR and P@k exact") {
    import spark.implicits._
    val disc = RankFusionOps.dcgDiscounts(3)
    // query A: rel at ranks 1 and 3 of 5 -> n_rel 2, hits@3 = 2,
    // dcg = disc(1)+disc(3), idcg = disc(1)+disc(2)
    // query B: no relevant -> NULL mrr/ndcg
    // query C: only rel at rank 5 (> k) -> p 0, mrr 1/5, ndcg 0
    val rows = Seq(
      ("A", 1L, true), ("A", 2L, false), ("A", 3L, true),
      ("A", 4L, false), ("A", 5L, false),
      ("B", 1L, false), ("B", 2L, false),
      ("C", 1L, false), ("C", 2L, false), ("C", 3L, false),
      ("C", 4L, false), ("C", 5L, true))
    val got = RankFusionOps.rankedEval(
        rows.toDF("q", "rnk", "rel"), "q", "rnk", "rel", k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(1) == 2L && a.getLong(2) == 2L)
    assert(a.getDouble(3) == 2.0 / 3.0)
    assert(a.getDouble(4) == 1.0)
    assert(a.getDouble(5) ==
      (disc(0) + disc(2)).toDouble / (disc(0) + disc(1)).toDouble)
    assert(got("B").isNullAt(4) && got("B").isNullAt(5))
    val c = got("C")
    assert(c.getLong(2) == 0L && c.getDouble(3) == 0.0)
    assert(c.getDouble(4) == 1.0 / 5.0)
    assert(c.getDouble(5) == 0.0, "rel outside top-k scores 0, not NULL")
  }

  test("rankedEval: a perfect top-k ranking scores NDCG exactly 1") {
    import spark.implicits._
    val rows = (1L to 10L).map(r => ("q", r, r <= 4))
    val got = RankFusionOps.rankedEval(
      rows.toDF("q", "rnk", "rel"), "q", "rnk", "rel", k = 5).head()
    assert(got.getDouble(5) == 1.0)
    assert(got.getDouble(3) == 4.0 / 5.0)
  }

  // ------------------------------------------------------------------
  // targetEncode
  // ------------------------------------------------------------------

  test("targetEncode: shrunken means exact — rare categories pull to " +
      "the global mean; m = 0 is the plain category mean") {
    import spark.implicits._
    val rows = Seq(("a", 100L), ("a", 200L), ("b", 400L))
    val got = Stats.targetEncode(rows.toDF("c", "v"), "c", "v", 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // N = 3, S = 700, m = 1:
    // a: (300*3 + 700) / ((2+1)*3) = 1600/9; b: (400*3 + 700) / (2*3)
    assert(got("a") == ((2L, 300L, 1600.0 / 9.0)))
    assert(got("b") == ((1L, 400L, 1900.0 / 6.0)))
    val plain = Stats.targetEncode(rows.toDF("c", "v"), "c", "v", 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(plain("a") == 150.0 && plain("b") == 400.0)
  }

  test("targetEncode: singleton corpus encodes to its own value; " +
      "negative prior weight fails loudly") {
    import spark.implicits._
    val one = Seq(("x", 42L)).toDF("c", "v")
    assert(Stats.targetEncode(one, "c", "v", 100L).head().getDouble(3)
      == 42.0)
    val e = intercept[IllegalArgumentException] {
      Stats.targetEncode(one, "c", "v", -1L)
    }
    assert(e.getMessage.contains("priorWeight"))
  }
}
