package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 tenth batch vs hand references: vocabulary coverage curve. */
class Round13jOpsSpec extends SparkSpec {

  test("vocabCoverage: exact top-k token-mass shares with the " +
      "(count desc, term) tie-break; k past the vocab saturates") {
    import spark.implicits._
    // counts: the=5, a=3, b=3, c=1 (12 tokens, 4 types)
    // top-1 = the (5/12 -> 416); top-2 = the+a (tie a<b) = 8/12 -> 666;
    // top-3 = 11/12 -> 916; top-10 = 12/12 -> 1000
    val docs = Seq("the the the a a b", "the the a b b c")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = TokenizerOps.vocabCoverage(
        docs.toDF("doc_id", "text"), "text", Seq(1, 2, 3, 10))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((4L, 5L, 12L, 416L)))
    assert(got(2L) == ((4L, 8L, 12L, 666L)),
      "tie at count 3 breaks to 'a' before 'b'")
    assert(got(3L) == ((4L, 11L, 12L, 916L)))
    assert(got(10L) == ((4L, 12L, 12L, 1000L)))
  }

  test("vocabCoverage: empty corpus reports zero mass and NULL " +
      "permille; unsorted ks fail loudly") {
    import spark.implicits._
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val got = TokenizerOps.vocabCoverage(empty, "text", Seq(5)).head()
    assert(got.getLong(1) == 0L && got.getLong(3) == 0L &&
      got.isNullAt(4))
    val e = intercept[IllegalArgumentException] {
      TokenizerOps.vocabCoverage(empty, "text", Seq(10, 5))
    }
    assert(e.getMessage.contains("ascending"))
  }
}
