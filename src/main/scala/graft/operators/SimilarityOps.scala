package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`), SURVEY.md §7 step 10.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set, scan the corpus once, per-partition top-k via window. The
  *    baseline and the verifier for the approximate path.
  *  - [[lshTopK]]: signed-random-projection LSH — per-row signature, bucket
  *    join, exact re-rank within buckets. The 100 TB path: the corpus scan
  *    shuffles only bucket-matched candidates, never all-pairs.
  *
  * Dot products use `zip_with` + `aggregate` in double precision — stays
  * inside codegen, no UDF in the hot loop.
  */
object SimilarityOps {

  /** Elementwise dot product of two array<float|double> columns, summed in
    * index order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Exact cosine top-k of each query vector against the corpus.
    *
    * `queries`: (qid, qvec); `corpus`: (id, vec). Output
    * (qid, rank, id, cosine) with rank 1..k, ties broken by corpus id.
    * The query side is broadcast — the corpus (the 100 TB side) streams. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qid: String = "qid", qvec: String = "qvec",
      id: String = "id", vec: String = "vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col(qvec), col(vec)))
    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qid), col("rank"), col(id), col("cosine"))
  }

  /** Signed-random-projection (hyperplane) LSH signature: `numBits` sign
    * bits of projections onto deterministic pseudo-random planes
    * (plane component r_{b,j} derived from splitmix64 — reproducible
    * everywhere). */
  def srpSignature(numBits: Int): Column => Column = {
    val nb = numBits
    val f = udf { v: Seq[Float] =>
      var sig = 0L
      var b = 0
      while (b < nb) {
        var s = 0.0
        var j = 0
        while (j < v.length) {
          // pseudo-random ±1 plane component from (b, j)
          val h = DedupOps.splitmix64(b.toLong * 1000003L + j)
          s += (if ((h & 1L) == 1L) v(j) else -v(j))
          j += 1
        }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    f.apply(_)
  }

  /** Approximate top-k: SRP signatures, candidate = corpus vectors sharing
    * at least one of `bands` signature bands with the query, exact cosine
    * re-rank within candidates. Recall rises with bands; cost stays
    * proportional to bucket collision count, not corpus size × queries. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numBits: Int = 32, bands: Int = 4,
      qid: String = "qid", qvec: String = "qvec",
      id: String = "id", vec: String = "vec"): DataFrame = {
    require(numBits % bands == 0)
    val rowsPerBand = numBits / bands
    val mask = (1L << rowsPerBand) - 1
    val sig = srpSignature(numBits)

    def banded(df: DataFrame, idc: String, sigName: String): DataFrame =
      df.withColumn(sigName, sig(col(if (idc == qid) qvec else vec)))
        .select(col("*"),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col(sigName), b * rowsPerBand).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandVal")

    val qb = banded(broadcast(queries), qid, "qsig")
    val cb = banded(corpus, id, "csig")
    // Compute cosine at the band-match site (both vectors in hand), THEN
    // dedup multi-band hits on the narrow (qid, id, cosine) rows — never
    // shuffles the vectors themselves.
    val candidates = cb.join(qb, Seq("band", "bandVal"))
      .select(col(qid), col(id), cosine(col(qvec), col(vec)).as("cosine"))
      .groupBy(col(qid), col(id)).agg(max(col("cosine")).as("cosine"))

    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qid), col("rank"), col(id), col("cosine"))
  }
}
