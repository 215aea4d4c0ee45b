package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The Java/py4j facade drives the same operators through an untyped
  * DataFrame boundary (the exact shape a PySpark caller sees). */
class JavaApiSpec extends SparkSpec {

  private def samFixture: String = {
    val p = Paths.get(tmpDir(), "ja.sam")
    Files.writeString(p,
      """@HD	VN:1.6	SO:unsorted
        |@SQ	SN:chr1	LN:10000
        |@RG	ID:rg1	SM:s1
        |a1	0	chr1	101	60	10M	*	0	0	ACGTACGTAC	IIIIIIIIII	RG:Z:rg1
        |a2	0	chr1	101	60	10M	*	0	0	ACGTACGTAC	FFFFFFFFFF	RG:Z:rg1
        |""".stripMargin)
    p.toString
  }

  test("loadAlignments + markDuplicates + flagStat over plain DataFrames") {
    val reads = JavaApi.loadAlignments(spark, samFixture)
    assert(reads.count() == 2)
    val marked = JavaApi.markDuplicates(reads)
    assert(marked.filter(col("duplicateRead") === true).count() == 1)
    assert(JavaApi.flagStat(reads).count() == 1)
    assert(JavaApi.countKmers(reads, 4).count() > 0)
  }

  test("regionJoin and overlapCounts from untyped inputs") {
    import spark.implicits._
    val l = Seq(("chr1", 0L, 100L, 1L), ("chr1", 500L, 600L, 2L))
      .toDF("referenceName", "start", "end", "id")
    val r = Seq(("chr1", 50L, 60L, 10L)).toDF("referenceName", "start", "end", "id")
    assert(JavaApi.regionJoin(l, r, "inner").count() == 1)
    assert(JavaApi.broadcastRegionJoin(l, r, "left_outer").count() == 2)
    val counts = JavaApi.overlapCounts(l, r).select("id", "n_overlaps")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 0L))
  }

  test("dedup + text pipeline facade methods") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),
      (3L, "completely different text entirely here now", "books"))
      .toDF("doc_id", "text", "domain")
    assert(JavaApi.exactDuplicates(docs, "doc_id", "text").count() == 1)
    assert(JavaApi.dropExactDuplicates(docs, "doc_id", "text").count() == 2)
    val pairs = JavaApi.minhashNearDuplicates(docs, "doc_id", "text", 32, 2, 8, 0.9)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    val clusters = JavaApi.clusterDuplicates(pairs.select("id_a", "id_b"))
    assert(clusters.count() >= 2)
    val rates = new java.util.HashMap[String, Double]()
    rates.put("web", 1.0)
    val sampled = JavaApi.stratifiedSample(docs, "domain", "doc_id", rates, 0.0)
    assert(sampled.select("domain").distinct().collect().map(_.getString(0)).toSet
      == Set("web"))
    assert(JavaApi.langId(docs, "text").columns.contains("pred_lang"))
  }

  test("ANN facade methods") {
    import spark.implicits._
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(j => (i * 8 + j).toFloat / 100f)))
      .toDF("id", "vec")
    val q = vecs.limit(2).select(col("id").as("qid"), col("vec").as("qvec"))
    assert(JavaApi.bruteForceTopK(q, vecs, 3).count() == 6)
    assert(JavaApi.ivfTopK(q, vecs, 3, 4, 4).count() == 6)
    assert(JavaApi.cosineNearDuplicates(vecs, "id", "vec", 0.9999).count() > 0)
  }
}
