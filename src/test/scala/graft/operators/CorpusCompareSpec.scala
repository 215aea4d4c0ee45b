package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-comparison family: novelty attribution, source cosine
  * similarity, chi-square feature selection. */
class CorpusCompareSpec extends SparkSpec {

  test("sourceNovelty attributes first-seen fingerprints in source order") {
    import spark.implicits._
    // a: two docs, one internal dup; b: one novel + one copy of a's doc;
    // c: nothing new at all
    val docs = Seq(
      (1L, "a", "alpha text"), (2L, "a", "alpha  TEXT "),
      (3L, "a", "beta"),
      (4L, "b", "gamma"), (5L, "b", "alpha text"),
      (6L, "c", "beta"), (7L, "c", "gamma")
    ).toDF("doc_id", "source", "text")
    val out = CorpusCompareOps.sourceNovelty(docs, "text", "source")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out == Map(
      "a" -> ((3L, 2L, 2L, 2.0 / 3.0)),
      "b" -> ((2L, 2L, 1L, 0.5)),
      "c" -> ((2L, 2L, 0L, 0.0))))
  }

  test("sourceSimilarity: identical sources cosine 1, overlap by hand") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "apple banana banana"),
      (2L, "y", "apple banana banana"),
      (3L, "z", "apple cherry")
    ).toDF("doc_id", "source", "text")
    val out = CorpusCompareOps.sourceSimilarity(docs, "text", "source",
        buckets = 4096)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    // identical vectors: the value is the DETERMINISTIC chain
    // dot/(sqrt(na)*sqrt(nb)) — for (1,2)·(1,2)=5 that's ~1 up to the
    // one defined rounding (sqrt(5)^2 != 5 in IEEE), bit-replayable by
    // the oracle's identical expression
    assert(out(("x", "y"))._2 == 5.0 / (math.sqrt(5.0) * math.sqrt(5.0)))
    assert(math.abs(out(("x", "y"))._2 - 1.0) < 1e-15)
    // x=(apple:1,banana:2), z=(apple:1,cherry:1): dot=1, |x|^2=5, |z|^2=2
    val expect = 1.0 / (math.sqrt(5.0) * math.sqrt(2.0))
    assert(out(("x", "z")) == ((1L, expect)))
    assert(out(("y", "z")) == ((1L, expect)))
  }

  test("sourceSimilarity: disjoint vocabularies emit no pair row") {
    import spark.implicits._
    val docs = Seq((1L, "x", "apple"), (2L, "y", "zebra"))
      .toDF("doc_id", "source", "text")
    assert(CorpusCompareOps.sourceSimilarity(docs, "text", "source")
      .count() == 0L)
  }

  test("chiSquareFeatures ranks the discriminative token over the uniform one") {
    import spark.implicits._
    // 'marker' appears only under label p; 'common' is uniform
    val docs = Seq(
      (1L, "p", "marker common"), (2L, "p", "marker common"),
      (3L, "q", "common other"), (4L, "q", "common other")
    ).toDF("doc_id", "source", "text")
    val out = CorpusCompareOps.chiSquareFeatures(
        docs, "source", "text", buckets = 4096, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // driver-side replay of the exact quantized formula
    val toks = Map("marker" -> Map("p" -> 2L, "q" -> 0L),
      "common" -> Map("p" -> 2L, "q" -> 2L),
      "other" -> Map("p" -> 0L, "q" -> 2L))
    val rt = Map("p" -> 4.0, "q" -> 4.0)
    val n = 8.0
    def chi2q(tok: String): Long = {
      val ct = toks(tok).values.sum.toDouble
      toks(tok).map { case (l, o) =>
        val e = rt(l) * ct / n
        val d = o.toDouble - e
        math.floor(d * d / e * 1e6 + 0.5).toLong
      }.sum
    }
    def bucket(tok: String): Long = {
      val h = graft.operators.DedupOps.fnv1a64(tok)
      ((h % 4096) + 4096) % 4096
    }
    val expect = Seq("marker", "common", "other")
      .map(t => bucket(t) -> chi2q(t)).toMap
    assert(out.toMap == expect)
    // the two single-label tokens outrank the uniform one
    assert(out.take(2).map(_._2).forall(_ > chi2q("common")))
    assert(chi2q("common") == 0L)
  }
}
