package graft.operators

import graft.SparkSpec

class TokenizerOpsSpec extends SparkSpec {

  /** CANONICAL greedy within-word merge application (leftmost-first,
    * single left-to-right scan) — deliberately NOT String.replace, so the
    * replay is an independent reference a replace-semantics bug cannot
    * hide behind. */
  private def greedyMerge(sym: String, a: String, b: String): String = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var rest = sym.trim.split(" ").toList
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
      case x :: tail => out += x; rest = tail
    }
    out.mkString(" ", " ", " ")
  }

  /** Driver-side replay of the exact trainer: word histogram -> per-round
    * weighted pair counts -> (count DESC, a ASC, b ASC) argmax ->
    * canonical greedy application. */
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
        vocab = vocab.map { case (sym, n) => (greedyMerge(sym, a, b), n) }
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
      syms = syms.map { case (s, n) => (greedyMerge(s, a, b), n) }
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

  test("immediately-consecutive pair occurrences merge fully (banana class)") {
    import spark.implicits._
    // 'banana' merging (a,n), 'haha' merging (a,h)/(h,a), '0000' merging
    // (0,0) on an even run — the class a single replace pass gets wrong
    // (' b an a n a ' instead of ' b an an a '). The driver replay is
    // canonical greedy, NOT String.replace, so divergence would fail here.
    val tricky = Seq(
      "banana banana banana bandana cabana",
      "haha hahaha hah 0000 00000000 ha",
      "naan naan nan banana")
    val docs = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TokenizerOps.bpeMerges(docs, "text", numMerges = 8)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got === referenceBpe(tricky, 8))
    // and the applied vocabulary agrees token-for-token, not just the table
    val stats = TokenizerOps.bpeTokenStats(docs, "text", 8, 1000).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    var syms: Map[String, Long] = tricky
      .flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => (" " + w.toCharArray.mkString("", " ", " "), n) }
    referenceBpe(tricky, 8).foreach { case (_, a, b, _, _) =>
      syms = syms.map { case (s, n) => (greedyMerge(s, a, b), n) }
    }
    val expected = syms.toSeq
      .flatMap { case (s, n) => s.trim.split(" ").map(t => (t, n)) }
      .groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
      .map { case (t, (w, o)) => (t, w, o) }.toSeq.sorted
    assert(stats === expected)
  }

  test("same-symbol runs merge leftmost-greedy (runs of 5 and 8)") {
    import spark.implicits._
    // The hardest application case: a same-symbol pair over a long run.
    // A naive replace-until-fixpoint pairs alternate positions (run of 8
    // zeros fixes to [00,0,00,0,00]); canonical greedy pairs from the
    // left ([00,00,00,00], odd runs leave the singleton at the END). The
    // doubled-separator replace must reproduce canonical exactly, down
    // to second-round pair counts that see the leftover's position.
    val runs = Seq("aaaaa aaaaa aaa 00000000 0000 z")
    val docs = runs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TokenizerOps.bpeMerges(docs, "text", numMerges = 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got === referenceBpe(runs, 4))
    // round 1 winner is (a,a) c=10 (2x4 in aaaaa + 2 in aaa) over (0,0)
    // c=10 tie broken by symbol; pin the tie-break actually exercised
    assert((got(0)._2, got(0)._3) === ("0", "0"))
    val stats = TokenizerOps.bpeTokenStats(docs, "text", 1, 10).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    // after one merge (0,0): 00000000 -> 4x'00'; 0000 -> 2x'00'; others raw
    assert(stats("00") === 6L)
    assert(!stats.contains("0"))
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
