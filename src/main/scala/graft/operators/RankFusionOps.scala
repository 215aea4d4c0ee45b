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
}
