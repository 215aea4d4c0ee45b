package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
  * combine two retrieval rankings (lexical BM25 + dense ANN, or two
  * query expansions) without score calibration: each list contributes
  * 1/(k + rank) and the fused order is the contribution sum.
  *
  * House-exact: the contribution quantizes to `1e12 div (k + rank)` —
  * pure INTEGER floor division, no floats anywhere — so the fused
  * scores and the (rrf_q DESC, id) order replay bit-for-bit in any
  * engine. With k = 60 and ranks < 10^6 every quantum is distinct
  * enough that fusion order matches the real-valued RRF except for
  * ties real RRF also has.
  *
  * Scale: both inputs are top-N ranking tables (bounded — they come out
  * of a retrieval stage, not the corpus), so the full-outer id join and
  * the TakeOrdered head run on bounded data; nothing here touches the
  * corpus.
  */
object RankFusionOps {

  /** exact integer floor division of non-negative longs */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  private val Quantum = 1000000000000L // 1e12

  /** Fuse two (idCol, rankCol) rankings (rank 1-based). Ids absent from
    * one list contribute only from the other (standard RRF). Output:
    * (idCol, rrf_q, rank_a, rank_b) — ranks null when absent — ordered
    * (rrf_q DESC, id), head `topN`. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
      k: Int = 60, topN: Int = 100): DataFrame = {
    require(k >= 0 && topN > 0)
    def contrib(r: Column): Column =
      when(r.isNull, lit(0L))
        .otherwise(idiv(lit(Quantum), r.cast("long") + k))
    val ra = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val rb = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol),
        (contrib(col("rank_a")) + contrib(col("rank_b"))).as("rrf_q"),
        col("rank_a"), col("rank_b"))
      .orderBy(col("rrf_q").desc, col(idCol))
      .limit(topN)
  }

  /** Quantized DCG position discounts `floor(1/log2(i+1) · 1e7 + 0.5)`
    * for i = 1..k, computed ONCE in this JVM and embedded as literals in
    * both the plan and the oracle SQL (the [[Stats.BenfordP]] recipe) —
    * so [[rankedEval]] carries NO transcendental function in either
    * engine and the sums are pure integers. */
  def dcgDiscounts(k: Int): IndexedSeq[Long] =
    (1 to k).map(i =>
      math.floor(1.0 / (math.log(i + 1.0) / math.log(2.0)) * 1e7 + 0.5)
        .toLong)

  /** Ranked-retrieval quality per query against boolean relevance —
    * the eval every retrieval/selection stage needs before its ranking
    * is trusted: precision@k, MRR (1/first-relevant-rank), and NDCG@k.
    * Input: one row per (query, candidate) with a 1-based `rankCol` and
    * a boolean `relCol`; relevance totals are counted WITHIN the
    * provided ranking (the judged-pool convention).
    *
    * Exactness: DCG@k sums the embedded [[dcgDiscounts]] integers over
    * relevant rows with rank <= k; IDCG@k is the prefix sum of the same
    * table at min(k, n_rel); `ndcg = dcg/idcg` and `p_at_k = hits/k` and
    * `mrr = 1/rank` are each ONE int/int double division — no log, no
    * float sum, engine-identical by construction. Queries with no
    * relevant candidate report NULL mrr/ndcg (nothing to normalize by).
    *
    * Output per query: (queryCol, n_rel, rel_at_k, p_at_k, mrr, ndcg).
    *
    * Scale: one broadcast join of the k-row discount table onto the
    * rank-filtered rows + ONE map-side-combined keyed aggregation; query
    * cardinality unbounded. */
  def rankedEval(df: DataFrame, queryCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val disc = dcgDiscounts(k)
    val discDf = broadcast(
      disc.zipWithIndex.map { case (d, i) => (i + 1L, d) }
        .toDF("__rank", "__disc"))
    val idcg = disc.scanLeft(0L)(_ + _) // idcg(j) = prefix sum at j
    val idcgDf = broadcast(
      idcg.zipWithIndex.map { case (s, j) => (j.toLong, s) }
        .toDF("__nrel_k", "__idcg"))
    val base = df.select(col(queryCol).as("__q"),
      col(rankCol).cast("long").as("__r"), col(relCol).as("__rel"))
    val scored = base
      .join(discDf, base("__r") === discDf("__rank"), "left")
      .groupBy("__q")
      .agg(sum(when(col("__rel"), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("__rel") && col("__r") <= k, 1L).otherwise(0L))
          .as("rel_at_k"),
        min(when(col("__rel"), col("__r"))).as("__fr"),
        sum(when(col("__rel") && col("__r") <= k, col("__disc"))
          .otherwise(0L)).as("__dcg"))
    scored
      .join(idcgDf, least(col("n_rel"), lit(k.toLong)) === col("__nrel_k"))
      .select(col("__q").as(queryCol), col("n_rel"), col("rel_at_k"),
        (col("rel_at_k").cast("double") / lit(k.toDouble)).as("p_at_k"),
        when(col("__fr").isNull, lit(null).cast("double"))
          .otherwise(lit(1.0) / col("__fr").cast("double")).as("mrr"),
        when(col("n_rel") === 0, lit(null).cast("double"))
          .otherwise(col("__dcg").cast("double") /
            col("__idcg").cast("double")).as("ndcg"))
  }
}
