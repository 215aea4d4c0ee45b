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

  /** The per-key argmax of [[rendezvousShard]], factored out so the
    * ScalaCheck monotone-consistency property can drive it directly
    * (the HRW invariant: growing n→m moves ONLY keys whose argmax under
    * m lands in the new shards [n, m) — an argmax over a superset that
    * stays below n was already the argmax over the subset). */
  private[operators] def rendezvousShardOf(k: String, n: Int): Int = {
    val base = DedupOps.fnv1a64(if (k == null) "" else k)
    var best = 0
    var bestH = Long.MinValue
    var s = 0
    while (s < n) {
      val h = DedupOps.splitmix64(base + s * 0x9e3779b97f4a7c15L)
      if (h >= bestH) { bestH = h; best = s }
      s += 1
    }
    best
  }

  /** Rendezvous (highest-random-weight) shard of a key: the shard s in
    * [0, nShards) maximizing `splitmix64(fnv1a64(key) + s*GOLDEN)` —
    * EXACTLY the MinHash permutation family (same s-from-0 convention:
    * [[DedupOps.splitmix64]] folds one more GOLDEN in itself, which the
    * HashOracleSql twin restates as (s+1))
    * ([[DedupOps.minhashSignature]]), signed-Long comparison, ties
    * (never observed, deterministic anyway) to the LARGEST shard id.
    * The splitmix finisher is load-bearing, not styling: bare
    * `fnv1a64(key + "#" + s)` differs across s only in its LAST char,
    * and one FNV step moves a low-nibble change by only ~2^40 — the
    * top comparison bits barely move, so the argmax degenerates to
    * "whichever digit xors highest" and a grow-resize moved 51% of keys
    * instead of the theoretical 20% (caught by the spec's distribution
    * band). Unlike `pmod(hash, n)` assignment, a resize from n to m
    * shards moves ONLY the keys whose new-shard hash wins — expected
    * moved fraction (m-n)/m on grow instead of pmod's
    * reshuffle-almost-everything.
    *
    * Scale: pure per-row arithmetic (ONE fnv + nShards splitmix steps),
    * zero shuffle; nShards is a routing-table size (tens to a few
    * thousand), never data-scale. */
  def rendezvousShard(key: org.apache.spark.sql.Column,
      nShards: Int): org.apache.spark.sql.Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val n = nShards
    val f = udf { k: String => rendezvousShardOf(k, n) }
    f(key.cast("string"))
  }

  /** Resize audit for rendezvous sharding: assign every DISTINCT key
    * under `fromShards` and `toShards`, report one row —
    * (n_keys, n_moved, moved_permille) — plus nothing else, so the
    * operator is a cheap pre-flight before a shard-count change ("does
    * this resize move the ~(m-n)/m of keys the theory promises, or did
    * someone wire pmod in somewhere?"). Exact integer permille.
    *
    * Scale: one distinct on the key column (map-side combined), then
    * per-row arithmetic (2 bounded hash scans per key) and ONE global
    * aggregation — no join, no window. */
  def rendezvousMoveReport(df: DataFrame, keyCol: String,
      fromShards: Int, toShards: Int): DataFrame = {
    require(fromShards > 0 && toShards > 0,
      s"shard counts must be positive: $fromShards -> $toShards")
    df.select(col(keyCol).as("__k")).distinct()
      .select(rendezvousShard(col("__k"), fromShards).as("__from"),
        rendezvousShard(col("__k"), toShards).as("__to"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("__from") =!= col("__to"), 1L).otherwise(0L))
          .as("n_moved"))
      .withColumn("moved_permille",
        expr("n_moved * 1000 div n_keys"))
  }
}
