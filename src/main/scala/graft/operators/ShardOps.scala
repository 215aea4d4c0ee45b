package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic size-balanced shard assignment — the training-data
  * write-path planner: pack documents into `nShards` output shards with
  * near-equal total token mass, so every downstream reader (a data
  * loader pulling one shard per worker) gets the same amount of work.
  *
  * The assignment is LPT-flavored but fully order-determined (no greedy
  * bin state, so any engine reproduces it bit-for-bit): rank items by
  * size DESCENDING (tie by `tieBreak`) and deal ranks onto shards in
  * SERPENTINE (boustrophedon) order — pass 0 deals shards 0..n-1, pass 1
  * deals n-1..0, and so on. Each consecutive pass pair hands every shard
  * one "high" and one "low" pick, so shard totals track the ideal
  * mass/n far tighter than plain round-robin (which systematically
  * favors shard 0 on a sorted stream).
  *
  * Scale: the global rank is [[Quantiles.globalRank]]'s two-phase
  * range-partition recipe — the sort work stays parallel and the only
  * unkeyed window runs over one row per range partition. The shard map
  * itself is pure per-row integer arithmetic on the rank.
  *
  * PLAN-OWNED CACHE (tier 2, operators/Caching.scala): like
  * [[Quantiles.globalNtile]]/calibrationCurve, the returned plan re-reads
  * globalRank's one materialization of the nondeterministic ids — the
  * cache's lifetime belongs to the returned Dataset or the caller's
  * cache cleanup.
  */
object ShardOps {

  /** Assign every row a 0-based `shard` (see object doc). */
  def balancedShards(df: DataFrame, sizeCol: String, tieBreak: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val ranked = Quantiles.globalRank(
      df, Seq(col(sizeCol).desc, col(tieBreak)))
    val idx = col("__grank") - 1L
    val pass = Quantiles.idiv(idx, lit(nShards.toLong))
    val pos = idx % nShards
    val shard = when(pass % 2 === 0, pos).otherwise(lit(nShards - 1) - pos)
    ranked
      .withColumn("shard", shard.cast("int"))
      .drop("__grank", "__total")
  }

  /** Per-shard balance report: (shard, n_items, total_size) — the
    * bounded summary a pipeline logs to prove the pack is tight. */
  def shardReport(df: DataFrame, sizeCol: String, tieBreak: String,
      nShards: Int): DataFrame =
    balancedShards(df, sizeCol, tieBreak, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_items"),
        sum(col(sizeCol)).cast("long").as("total_size"))
}
