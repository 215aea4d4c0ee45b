package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-8 text-pipeline additions: cross-document line
  * dedup, sliding-window chunking, and PMI collocation mining. */
class TextPipelineOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------ phraseSearch -----------------------------------

  test("phraseSearch equals a driver sliding-window replay") {
    val corpus = Seq(
      1L -> "the quick brown fox and the quick brown dog",
      2L -> "quick brown quick brown quick brown",
      3L -> "brown quick nothing here",
      4L -> "Quick BROWN, punctuation! quick-brown",
      5L -> "quick quick quick", // repeated-word phrase below
      6L -> "")
    def replay(phrase: Seq[String]): Map[Long, Long] =
      corpus.flatMap { case (id, t) =>
        val ts = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        val n = ts.sliding(phrase.length)
          .count(w => w.length == phrase.length && w == phrase)
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
    for (phrase <- Seq(Seq("quick", "brown"),
        Seq("the", "quick", "brown"), Seq("quick", "quick"),
        Seq("nothing"))) {
      val got = TextOps.phraseSearch(docs(corpus: _*), "doc_id", "text",
        phrase).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === replay(phrase), s"phrase=$phrase")
    }
    // overlapping repeated-word matches count individually: "quick quick"
    // in "quick quick quick" occurs at positions 0 and 1
    val rep = TextOps.phraseSearch(docs(corpus: _*), "doc_id", "text",
      Seq("quick", "quick")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep(5L) === 2L)
  }

  // ------------------------ globalLineDedup --------------------------------

  test("globalLineDedup removes lines shared by >= minDocs docs, keeps order") {
    val d = docs(
      1L -> "unique one\nshared footer\nmore text",
      2L -> "other content\nshared footer",
      3L -> "shared footer\nthird doc body",
      4L -> "solo document")
    val out = TextOps.globalLineDedup(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("unique one\nmore text", 1L)))
    assert(out(2L) == (("other content", 1L)))
    assert(out(3L) == (("third doc body", 1L)))
    assert(out(4L) == (("solo document", 0L)))
  }

  test("globalLineDedup counts a within-doc repeat once toward doc frequency") {
    // "x" repeats twice inside doc 1 but only 2 DISTINCT docs contain it:
    // below minDocs=3, so it must survive everywhere.
    val d = docs(1L -> "x\nx\na", 2L -> "x\nb", 3L -> "c")
    val out = TextOps.globalLineDedup(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "x\nx\na")
    assert(out(2L) == "x\nb")
  }

  test("globalLineDedup keeps fully-boilerplate docs as empty rows") {
    val d = docs(1L -> "f", 2L -> "f", 3L -> "f\nkeep me")
    val out = TextOps.globalLineDedup(d, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("", 1L)))
    assert(out(2L) == (("", 1L)))
    assert(out(3L) == (("keep me", 1L)))
    assert(out.size == 3)
  }

  // ------------------------ chunkDocuments ---------------------------------

  test("chunkDocuments covers every char; last chunk short; overlap = size-stride") {
    val text = "abcdefghij" // 10 chars
    val out = TextOps.chunkDocuments(docs(1L -> text), "doc_id", "text",
        size = 4, stride = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // offsets 0,3,6 cover chars 0..9 (last chunk "ghij" len 4); next
    // offset 9 would start inside the text IF (len-size) not yet covered:
    // lastChunk = ceil((10-4)/3) = 2 -> chunks at 0,3,6
    assert(out.toSeq == Seq(
      (0L, "abcd", 4L), (1L, "defg", 4L), (2L, "ghij", 4L)))
  }

  test("chunkDocuments ragged tail and empty doc") {
    val out = TextOps.chunkDocuments(docs(1L -> "abcdefgh", 2L -> ""),
        "doc_id", "text", size = 5, stride = 5)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 0L, "abcde"), (1L, 1L, "fgh"), (2L, 0L, "")))
  }

  test("chunkDocuments row count = sum over docs of 1+ceil(max(0,len-size)/stride)") {
    val d = docs((1L to 20L).map(i => i -> ("x" * (i * 7).toInt)): _*)
    val n = TextOps.chunkDocuments(d, "doc_id", "text", size = 30, stride = 10)
      .count()
    val expected = (1L to 20L).map { i =>
      val len = i * 7
      1L + math.max(0L, len - 30 + 10 - 1) / 10
    }.sum
    assert(n == expected)
  }

  // ------------------------ collocationsPmi --------------------------------

  test("collocationsPmi ranks the exclusive pair above the promiscuous one") {
    // "hong kong" always together (high PMI); "the end" with "the"
    // everywhere (low PMI). 6 repeats clear minCount=5.
    val base = Seq(
      "hong kong is far",
      "the story has the end here",
      "the cat saw the end of the show")
    val d = docs((1L to 6L).flatMap(i =>
      base.zipWithIndex.map { case (t, j) => (i * 10 + j).toLong -> t }): _*)
    val out = TextOps.collocationsPmi(d, "text", minCount = 5L, k = 20)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val rank = out.zipWithIndex.collect {
      case ((w1, w2, _), i) if (w1, w2) == ("hong", "kong") => ("hk", i)
      case ((w1, w2, _), i) if (w1, w2) == ("the", "end") => ("te", i)
    }.toMap
    assert(rank.contains("hk") && rank.contains("te"))
    assert(rank("hk") < rank("te"))
    // exclusive-pair PMI: p(w1,w2)=c/B with c1=c2=c -> ln(B/c) ... positive
    val hk = out.find(r => r._1 == "hong" && r._2 == "kong").get
    assert(hk._3 > 0L)
  }

  test("collocationsPmi enforces minCount and the deterministic tie-break") {
    val d = docs(
      1L -> "a b a b a b a b a b", // "a b" x5, "b a" x4
      2L -> "rare pair")
    val out = TextOps.collocationsPmi(d, "text", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "b"))) // "b a"=4 < 5, "rare pair"=1
  }

  // ------------------------ tfidfKeywords ----------------------------------

  test("tfidfKeywords surfaces doc-specific terms over ubiquitous ones") {
    // "common" appears in every doc (idf = ln(4/4) small); each doc's own
    // marker term appears only there (idf = ln(4/2) larger)
    val d = docs(
      1L -> "common common alpha alpha alpha",
      2L -> "common common beta beta beta",
      3L -> "common gamma gamma gamma")
    val out = TextOps.tfidfKeywords(d, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("tfidfKeywords rank caps at k with term tie-break") {
    val d = docs(1L -> "x y z x y z") // all tf=2, same idf -> term order
    val out = TextOps.tfidfKeywords(d, "doc_id", "text", k = 2)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(out == Seq("x", "y"))
  }

  // ------------------------ zipfFit ----------------------------------------

  test("zipfFit recovers ~ -1 slope on synthetic zipfian counts") {
    // term i repeated floor(1000/i) times: perfect 1/rank profile
    val text = (1 to 50).flatMap(i =>
      Seq.fill(1000 / i)(f"t$i%02d")).mkString(" ")
    val row = TextOps.zipfFit(docs(1L -> text), "text").collect().head
    val slope = row.getDouble(4)
    assert(row.getLong(0) == 50L)
    assert(slope < -0.9 && slope > -1.1, s"slope $slope")
  }

  // ------------------------ containmentJoin --------------------------------

  test("containmentJoin finds embedded quotes MinHash-Jaccard would miss") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (40 to 60).map(i => s"w$i").mkString(" ") // suffix of big
    val other = (100 to 160).map(i => s"q$i").mkString(" ")
    val d = docs(1L -> big, 2L -> quote, 3L -> other)
    val out = DedupOps.containmentJoin(d, "doc_id", "text",
        shingleN = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == 1)
    val (a, b, ca, cb) = out.head
    assert((a, b) == ((1L, 2L)))
    // quote's shingles all embed in big: containment of the SMALLER is 1
    assert(cb == 1.0 && ca < 0.5)
  }

  test("containmentJoin matches brute force on a random corpus (completeness)") {
    // docs are overlapping word-windows of one master sequence, so nested
    // and heavily-overlapping pairs exist at every containment level
    val rnd = new scala.util.Random(31)
    val master = (0 until 200).map(_ => s"m${rnd.nextInt(50)}")
    val texts = (1L to 60L).map { i =>
      val start = rnd.nextInt(170)
      val len = 8 + rnd.nextInt(30)
      i -> master.slice(start, math.min(200, start + len)).mkString(" ")
    }
    val t = 0.5
    def shingleSet(s: String) =
      DedupOps.shingles(s, 3).distinct.toSet
    val expected = (for {
      (ia, ta) <- texts
      (ib, tb) <- texts
      if ia < ib
      sa = shingleSet(ta)
      sb = shingleSet(tb)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa intersect sb).size
      if math.max(inter.toDouble / sa.size, inter.toDouble / sb.size) >= t
    } yield (ia, ib)).toSet
    assert(expected.nonEmpty)
    val got = DedupOps.containmentJoin(docs(texts: _*), "doc_id", "text",
        shingleN = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"onlyOp=${(got -- expected).take(5)} missed=${(expected -- got).take(5)}")
  }

  test("zipfFit flat corpus (all counts equal) has slope ~ 0") {
    val text = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    val row = TextOps.zipfFit(docs(1L -> text), "text").collect().head
    assert(math.abs(row.getDouble(4)) < 1e-9, s"slope ${row.getDouble(4)}")
  }

  test("zipfFit distributed ranks equal a driver replay at any partitioning") {
    // the rank is local row_number + range-partition offsets; it must be
    // bit-identical to a global (count desc, token) rank however the
    // vocab lands in partitions
    val rnd = new scala.util.Random(7)
    val words = (1 to 500).map(i => s"v${rnd.nextInt(120)}")
    val text = words.mkString(" ")
    def replay(t: String): (Long, Long, Long, Long) = {
      val counts = t.split(" ").groupBy(identity).view
        .mapValues(_.length.toLong).toSeq
        .sortBy { case (tok, n) => (-n, tok) }
      val xy = counts.zipWithIndex.map { case ((_, n), r0) =>
        val x = math.floor(math.log((r0 + 1).toDouble) * 1e4 + 0.5).toLong
        val y = math.floor(math.log(n.toDouble) * 1e4 + 0.5).toLong
        (n, x, y)
      }
      val v = xy.length.toLong
      val sx = xy.map(_._2).sum; val sy = xy.map(_._3).sum
      val sxy = xy.map(t => t._2 * t._3).sum
      val sxx = xy.map(t => t._2 * t._2).sum
      (v, xy.map(_._1).sum, v * sxy - sx * sy, v * sxx - sx * sx)
    }
    val (v, tot, num, den) = replay(text)
    for (parts <- Seq(1, 7)) {
      val d = docs(words.zipWithIndex.map { case (w, i) =>
        (i + 1).toLong -> w }: _*).repartition(parts)
      val row = TextOps.zipfFit(d, "text").collect().head
      assert((row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3)) === ((v, tot, num, den)), s"parts=$parts")
    }
  }

  test("charEntropy equals a driver-side quantized replay") {
    val texts = Seq(1L -> "hello world", 2L -> "aaaa", 3L -> "abcdefgh",
      4L -> "the quick brown fox jumps over the lazy dog")
    val got = TextOps.charEntropy(docs(texts: _*))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    texts.foreach { case (id, t) =>
      val counts = t.toSeq.groupBy(identity).view.mapValues(_.size.toLong)
      val n = t.length.toLong
      val terms = counts.values.map(c =>
        math.floor(c * (math.log(n.toDouble) - math.log(c.toDouble)) * 1e6 + 0.5).toLong)
      val sum = terms.sum
      assert(got(id) === ((n, counts.size.toLong, sum, sum / n)), s"doc $id")
    }
  }

  test("charEntropy: repeated-char spam collapses to 0, uniform text ~ ln(k)") {
    val got = TextOps.charEntropy(docs(1L -> "zzzzzzzz", 2L -> "abcdefgh"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got(1L) === 0L)
    // uniform over 8 classes: H = ln 8 ~ 2.0794 nats -> ~2079441 micro-nats
    assert(math.abs(got(2L) - 2079441L) <= 8L, got(2L).toString)
  }
}
