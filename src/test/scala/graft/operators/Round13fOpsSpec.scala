package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 sixth batch vs hand references: robust (median/IQR)
  * scaling and skip-gram co-occurrence pairs. */
class Round13fOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // robustScale
  // ------------------------------------------------------------------

  test("robustScale: exact disc cuts, one double division, zero-IQR " +
      "group is NULL") {
    import spark.implicits._
    // group g: values 1..8 -> disc p25 = 2 (rank ceil(.25*8)=2),
    // p50 = 4, p75 = 6 -> iqr 4; x=8 scales to (8-4)/4 = 1.0
    val rows = (1L to 8L).map(v => ("g", v, v)) ++
      Seq(("z", 100L, 5L), ("z", 101L, 5L))
    val got = Stats.robustScale(
        rows.toDF("g", "id", "v"), "g", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    assert(got(("g", 8L)) == ((4L, 4L, 1.0)))
    assert(got(("g", 1L)) == ((4L, 4L, -0.75)))
    assert(got(("g", 4L))._3 == 0.0)
    assert(got(("z", 100L))._3.isNaN, "zero IQR -> NULL, not Infinity")
  }

  // ------------------------------------------------------------------
  // skipGramPairs
  // ------------------------------------------------------------------

  test("skipGramPairs: window membership, symmetry, cross-document " +
      "isolation, minCount floor") {
    import spark.implicits._
    // doc 1: "a b c d" with window 2: (a,b),(a,c),(b,a),(b,c),(b,d),
    // (c,a),(c,b),(c,d),(d,b),(d,c) — (a,d) is 3 apart, excluded
    // doc 2: "a b" — adds (a,b),(b,a); never pairs with doc 1 tokens
    val rows = Seq((1L, "a b c d"), (2L, "a b"))
    val got = TextOps.skipGramPairs(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        window = 2, minCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "b")) == 2L, "both docs contribute")
    assert(got(("b", "a")) == got(("a", "b")), "symmetric")
    assert(got(("a", "c")) == 1L)
    assert(!got.contains(("a", "d")), "distance 3 > window 2")
    assert(got(("c", "d")) == 1L && got(("d", "c")) == 1L)
    // minCount floor: at 2 only the (a,b)/(b,a) pairs survive
    val floored = TextOps.skipGramPairs(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        window = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(floored == Set(("a", "b"), ("b", "a")))
  }

  test("skipGramPairs: empty and single-token documents contribute " +
      "nothing; tokens lowercase") {
    import spark.implicits._
    val rows = Seq((1L, ""), (2L, "solo"), (3L, "Hi HI"))
    val got = TextOps.skipGramPairs(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        window = 2, minCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("hi", "hi") -> 2L))
  }
}
