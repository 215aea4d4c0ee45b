package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed k-means (Lloyd) over embedding columns, in FIXED-POINT
  * integer arithmetic so every step is bit-deterministic and replayable by
  * the DuckDB oracle: float sums are order-sensitive across engines (and
  * across Spark partitionings!), integer sums are not. Components are
  * quantized once to `round(x * scale)` longs; distances, sums and the
  * floor-divided centroid means all stay exact integers, so the same fit
  * on 4 or 4,000 partitions yields the SAME centroids — the property that
  * makes a clustering reproducible at 100 TB.
  *
  * This is the trainer for the centroid tables that
  * [[SimilarityOps.ivfAssignments]]/[[SimilarityOps.ivfTopKAgainst]] and
  * [[SimilarityOps.semanticDuplicates]] consume (via
  * [[centroidsAsFloat]]); their deterministic splitmix64 sample
  * (SimilarityOps.sampleCentroids) is exactly this trainer at iters=0.
  *
  * Scale shape per iteration: one narrow assignment pass (broadcast
  * centroids, k×dim longs), one (cid, dim) partial-aggregated shuffle of
  * k×dim cells, one bounded k×dim-row collect — the same bounded-collect
  * contract as the IVF centroid sample. The quantized projection is
  * persisted across iterations and released before returning.
  */
object ClusteringOps {

  /** 2^20 ≈ 6 decimal digits; |x| < 1024 keeps squared distances of
    * 64-dim vectors inside Long (and inside DOUBLE's 2^53 for the oracle). */
  val DefaultScale: Long = 1L << 20

  /** Fixed-point quantization of a float/double array column:
    * `floor(x * scale + 0.5)` per component (round-half-up — floor(+0.5),
    * not round(), because round's half-way rule differs across engines). */
  def quantize(vec: Column, scale: Long = DefaultScale): Column =
    transform(vec, x => floor(x.cast("double") * scale + lit(0.5)).cast("long"))

  /** Nearest-centroid id by squared L2 distance in Long math; ties take
    * the lowest ci (strict `<` keeps the first minimum). */
  private def assignUdf(cents: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]) =
    udf { qv: Seq[Long] =>
      val cs = cents.value
      var best = 0
      var bestD = Long.MaxValue
      var ci = 0
      while (ci < cs.length) {
        val c = cs(ci)
        var d = 0L
        var i = 0
        while (i < c.length) { val t = qv(i) - c(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      best
    }

  /** Lloyd-iterated centroids: (ci, cqvec) with cqvec in quantized longs.
    * Init = the k rows with smallest splitmix64(id) (ties by id) — the
    * same replayable deterministic sample as the IVF/SemDeDup centroid
    * seed. Update = per-dimension `floorDiv(sum, count)`; a cluster that
    * wins no points keeps its previous centroid. */
  def kmeansFit(
      corpus: DataFrame,
      k: Int,
      iters: Int,
      id: String = "vec_id",
      vec: String = "embedding",
      scale: Long = DefaultScale): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = corpus
      .select(col(id).cast("long").as("id"), quantize(col(vec), scale).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val smix = udf { x: Long => DedupOps.splitmix64(x) }
    var cents: Array[Array[Long]] = q
      .orderBy(smix(col("id")), col("id")).limit(k)
      .select("qv").collect().map(_.getSeq[Long](0).toArray)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val cells = q
        .select(assignUdf(bc)(col("qv")).as("cid"), col("qv"))
        .select(col("cid"), posexplode(col("qv")).as(Seq("d", "v")))
        .groupBy("cid", "d")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty clusters keep previous centroid
      cells.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
      }
      cents = next
      bc.destroy()
      it += 1
    }
    q.unpersist()
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("ci", "cqvec")
  }

  /** Map-side assignment of a corpus against a fitted (ci, cqvec) table:
    * (id, cid). One narrow pass, no shuffle — the probe shape. */
  def kmeansAssign(
      corpus: DataFrame,
      centroids: DataFrame,
      id: String = "vec_id",
      vec: String = "embedding",
      scale: Long = DefaultScale): DataFrame = {
    val cents = centroids.select(col("ci").cast("int"), col("cqvec"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).map(_._2)
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    corpus.select(col(id), assignUdf(bc)(quantize(col(vec), scale)).as("cid"))
  }

  /** De-quantized (ci, cvec float) view of a fitted centroid table — the
    * shape [[SimilarityOps.ivfAssignments]] / [[SimilarityOps.ivfTopKAgainst]]
    * consume, so a Lloyd-refined fit drops in where the splitmix sample
    * was. */
  def centroidsAsFloat(centroids: DataFrame, scale: Long = DefaultScale): DataFrame =
    centroids.select(col("ci"),
      transform(col("cqvec"), x => (x.cast("double") / scale).cast("float")).as("cvec"))
}
