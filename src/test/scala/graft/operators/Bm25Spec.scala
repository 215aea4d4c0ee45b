package graft.operators

import graft.SparkSpec

/** bm25Scores contract: the quantized score equals a plain-Scala replay of
  * the documented formula (same operation order), non-matching docs are
  * absent, and matched_terms counts distinct matched query terms. */
class Bm25Spec extends SparkSpec {

  private def quantized(
      tf: Long, df: Long, dl: Long, n: Long, dlsum: Long,
      k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val x = dl.toDouble / (dlsum.toDouble / n)
    val contrib = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * x))
    math.floor(contrib * 1e7 + 0.5).toLong
  }

  test("scores match a plain-Scala replay of the BM25 formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"),
      (2L, "dog bird"),
      (3L, "fish")).toDF("doc_id", "text")
    val out = TextOps.bm25Scores(docs, "doc_id", "text", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // N=3 docs, dlsum=6; df(cat)=1, df(dog)=2.
    val d1 = quantized(tf = 2, df = 1, dl = 3, n = 3, dlsum = 6) +
      quantized(tf = 1, df = 2, dl = 3, n = 3, dlsum = 6)
    val d2 = quantized(tf = 1, df = 2, dl = 2, n = 3, dlsum = 6)
    assert(out == Map(1L -> (d1, 2L), 2L -> (d2, 1L)))
  }

  test("rarer terms score higher at equal tf and dl") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common"), (2L, "common junk"), (3L, "common junk"),
      (4L, "junk junk")).toDF("doc_id", "text")
    val out = TextOps.bm25Scores(
        docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 holds both terms once each; the 'rare' contribution must
    // dominate: score(d1) > 2 * score(d2).
    assert(out(1L) > 2 * out(2L))
    assert(!out.contains(4L))
  }

  test("tokenization is lowercase alphanumeric runs") {
    import spark.implicits._
    val docs = Seq((1L, "Spark, SPARK; spark!"), (2L, "nothing")).toDF(
      "doc_id", "text")
    val out = TextOps.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // tf=3 after case folding and punctuation splits
    assert(out.head.getLong(1) ==
      quantized(tf = 3, df = 1, dl = 3, n = 2, dlsum = 4))
  }
}
