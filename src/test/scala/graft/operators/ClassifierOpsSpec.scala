package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierOpsSpec extends SparkSpec {

  private val B = 64

  /** Driver-side exact replay of train + classify (same fnv bucket,
    * 1e-7 log quanta, closed-form smoothing, label-asc tie-break). */
  private def replay(
      train: Seq[(Long, String, String)], test: Seq[(Long, String, String)],
      buckets: Int, alpha: Double): Map[Long, (String, Long)] = {
    def toks(t: String) =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def bucket(t: String): Long = {
      val h = DedupOps.fnv1a64(t); val m = buckets.toLong
      ((h % m) + m) % m
    }
    def q7(x: Double): Long = math.floor(math.log(x) * 1e7 + 0.5).toLong
    val ab = alpha * buckets
    val byLabel = train.groupBy(_._2)
    val counts: Map[String, Map[Long, Long]] = byLabel.view.mapValues(
      _.flatMap(r => toks(r._3)).groupBy(bucket).view
        .mapValues(_.size.toLong).toMap).toMap
    val tot = counts.view.mapValues(_.values.sum).toMap
    val nTrain = train.size.toLong
    val labels = byLabel.keys.toSeq.sorted
    test.map { case (id, _, text) =>
      val tks = toks(text)
      val scores = labels.map { l =>
        val t = tot.getOrElse(l, 0L)
        val q0 = q7(alpha / (t + ab))
        val prior = q7(byLabel(l).size.toDouble / nTrain)
        val s = prior + tks.length * q0 + tks.map { tk =>
          val c = counts(l).getOrElse(bucket(tk), 0L)
          if (c == 0) 0L else q7((c + alpha) / (t + ab)) - q0
        }.sum
        (l, s)
      }
      id -> scores.minBy { case (l, s) => (-s, l) }
    }.toMap
  }

  private val train = Seq(
    (2L, "en", "the cat and the dog sat on the mat with the hat"),
    (4L, "en", "a dog and a cat walk into the bar and talk"),
    (6L, "de", "der hund und die katze sitzen auf der matte"),
    (8L, "de", "die katze und der hund gehen in die stadt"),
    (10L, "fr", "le chat et le chien sont sur le tapis"),
    (12L, "fr", "la tortue et le chat vont dans la ville"))
  private val test = Seq(
    (1L, "en", "the cat sat with a dog on a mat"),
    (3L, "de", "der hund und die katze in der stadt"),
    (5L, "fr", "le chien et la tortue sur le tapis"),
    (7L, "en", "a cat and a dog talk"),
    (9L, "en", ""),
    (11L, "de", "die matte und der hund"))

  test("nbClassify equals the driver replay (incl. empty doc, ties)") {
    import spark.implicits._
    val trDf = train.toDF("doc_id", "lang", "text")
    val teDf = test.toDF("doc_id", "lang", "text")
    val model = ClassifierOps.nbTrain(trDf, "lang", "text", B)
    val got = ClassifierOps.nbClassify(teDf, model, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got === replay(train, test, B, 1.0))
  }

  test("the classifier actually routes languages (and the confusion sums)") {
    import spark.implicits._
    val trDf = train.toDF("doc_id", "lang", "text")
    val teDf = test.toDF("doc_id", "lang", "text")
    val conf = ClassifierOps.nbConfusion(trDf, teDf, "doc_id", "lang",
      "text", B).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf.values.sum === test.size.toLong)
    // every non-empty test doc routes to its true language
    assert(conf(("en", "en")) >= 2L)
    assert(conf(("de", "de")) === 2L)
    assert(conf(("fr", "fr")) === 1L)
  }

  test("model rows are bounded by labels x (buckets + 1)") {
    import spark.implicits._
    val trDf = train.toDF("doc_id", "lang", "text")
    val model = ClassifierOps.nbTrain(trDf, "lang", "text", B).collect()
    assert(model.length <= 3 * (B + 1))
    // exactly one prior row per label
    assert(model.count(_.getLong(1) == -1L) === 3)
  }

  test("bit-identical at any partitioning") {
    import spark.implicits._
    val trDf = train.toDF("doc_id", "lang", "text")
    val teDf = test.toDF("doc_id", "lang", "text")
    val a = ClassifierOps.nbConfusion(trDf, teDf, "doc_id", "lang",
      "text", B).collect().map(_.toSeq).toSet
    val b = ClassifierOps.nbConfusion(trDf.repartition(7),
      teDf.repartition(5), "doc_id", "lang", "text", B)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
