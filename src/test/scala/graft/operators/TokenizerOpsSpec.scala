package graft.operators

import graft.SparkSpec

class TokenizerOpsSpec extends SparkSpec {

  /** Driver-side replay of the exact trainer: word histogram -> per-round
    * weighted pair counts -> (count DESC, a ASC, b ASC) argmax ->
    * left-to-right non-overlapping replace. */
  private def referenceBpe(
      texts: Seq[String], numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
    var vocab: Map[String, Long] = words.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, n) => (" " + w.toCharArray.mkString("", " ", " "), n) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (r <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (sym, n) =>
        val syms = sym.trim.split(" ")
        syms.indices.dropRight(1).foreach { i =>
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, a, b, a + b, c))
        vocab = vocab.map { case (sym, n) =>
          (sym.replace(s" $a $b ", s" $a$b "), n)
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new",
    "lowest lowest wider wide wide low slow slower")

  test("bpeMerges equals the driver-side replay on the classic corpus") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TokenizerOps.bpeMerges(docs, "text", numMerges = 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)
    val ref = referenceBpe(corpus, 10)
    assert(got === ref)
    // sanity: the replay actually learned multi-char subwords
    assert(ref.exists(_._4.length >= 3))
  }

  test("bpeTokenStats: final-vocabulary occurrences are conserved") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val stats = TokenizerOps.bpeTokenStats(docs, "text", numMerges = 6,
      topK = 1000).collect()
    // merging never creates or destroys corpus mass measured in words:
    // summing (token occurrences * nothing) — every word contributes
    // size(symbols) tokens, and each merge reduces its own pair count;
    // conservation check: total occurrences == total symbols after merges
    // in the replay
    val words = corpus.flatMap(_.toLowerCase.split("[^a-z0-9]+"))
      .filter(_.nonEmpty)
    var syms: Map[String, Long] = words.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, n) => (" " + w.toCharArray.mkString("", " ", " "), n) }
    referenceBpe(corpus, 6).foreach { case (_, a, b, _, _) =>
      syms = syms.map { case (s, n) => (s.replace(s" $a $b ", s" $a$b "), n) }
    }
    val expectedTotal = syms.map { case (s, n) => s.trim.split(" ").length * n }.sum
    assert(stats.map(_.getLong(2)).sum === expectedTotal)
    // deterministic ordering contract
    val pairs = stats.map(r => (r.getLong(2), r.getString(0)))
    assert(pairs.sortBy { case (n, t) => (-n, t) }.toSeq === pairs.toSeq)
  }

  test("bpeEncodeCounts: conservation and bounds per document") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val enc = TokenizerOps.bpeEncodeCounts(docs, "doc_id", "text", 6)
      .collect()
    assert(enc.length === corpus.length)
    enc.foreach { r =>
      val (w, bpe, ch) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bpe >= w, "merges never split below one token per word")
      assert(bpe <= ch, "subwords never outnumber characters")
      assert(r.getLong(4) === ch * 1000 / bpe)
    }
    // corpus-wide subword mass equals the vocabulary-side occurrence total
    val statTotal = TokenizerOps.bpeTokenStats(docs, "text", 6, 1000)
      .collect().map(_.getLong(2)).sum
    assert(enc.map(_.getLong(2)).sum === statTotal)
  }

  test("merges are identical at any partitioning") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = TokenizerOps.bpeMerges(docs, "text", 8).collect().map(_.toString).sorted
    val b = TokenizerOps.bpeMerges(docs.repartition(7), "text", 8)
      .collect().map(_.toString).sorted
    assert(a === b)
  }
}
