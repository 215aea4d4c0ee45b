package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Explicit key-salting for skewed equi-joins.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when the exchange is absent (bucketed /
  * pre-partitioned inputs), when the join is shuffled-hash, or when a
  * single key's rows must ALSO pass through a downstream keyed window.
  * The classic fix is salting: fan the hot side's rows across `salts`
  * sub-keys with a deterministic hash of the row's own identity, and
  * replicate the other side once per salt value, so the join key becomes
  * (key, salt) and no reducer sees more than ~1/salts of a hot key.
  *
  * Result is EXACTLY the plain join (every left row meets every matching
  * right row exactly once: the left row carries one salt value, and the
  * right side has exactly one copy per salt value). The salt is a pure
  * hash of a caller-named identity column — deterministic across runs,
  * retries and repartitioning, per the same contract as
  * [[SamplingOps.uniformHash]].
  *
  * Cost model: the replicated side grows `salts`×, so salt with the
  * DIMENSION side replicated (fact side salted), and keep `salts` at the
  * skew factor, not the cluster size. Supported join types: inner and
  * left_outer (left = the salted side) — the ones whose semantics survive
  * per-left-row salting unchanged.
  */
object SkewOps {

  /** `left` ⋈ `right` on `usingKeys`, with `left` salted by
    * `saltKeyCol` (a left column whose hash spreads rows, e.g. the
    * primary key) and `right` replicated `salts` times. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, usingKeys: Seq[String],
      saltKeyCol: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer, got: $joinType")
    // A NULL saltKeyCol must still salt deterministically (to bucket 0):
    // fnv1a64(NULL) is NULL, and a NULL __salt would silently drop left
    // rows whose usingKeys match — violating the plain-join contract.
    val sl = left.withColumn("__salt",
      coalesce(
        pmod(GraftFunctions.fnv1a64(col(saltKeyCol).cast("string")),
          lit(salts.toLong)),
        lit(0L)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    sl.join(sr, usingKeys :+ "__salt", joinType).drop("__salt")
  }

  /** Key-skew profile: the top-`k` heaviest values of `keyCol`, each with
    * its row count and share of the table, plus the global row and
    * distinct-key totals on every row. This is the "measure before you
    * salt" diagnostic: share x cluster size tells you how many reducers a
    * hot key would monopolize, and top-share / (1/distinct) is the skew
    * factor that sizes [[saltedJoin]]'s `salts`.
    *
    * Plan: one map-side-combined count per key, then a `TakeOrdered` of
    * the (count DESC, key) head — never a global sort; the totals come
    * from the same aggregate re-aggregated (rows = distinct keys, bounded)
    * and broadcast-joined onto the k result rows.
    *
    * Output: (key, n, share, total_rows, n_keys), share = n/total in
    * IEEE double. */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(
      sum(col("n")).as("total_rows"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(k)
    // k-row bounded result: materialize it and release the per-key count
    // cache before returning (tier 1, see operators/Caching.scala)
    Caching.materializeAndRelease(
      top.crossJoin(broadcast(totals))
        .select(col("key"), col("n"),
          (col("n").cast("double") / col("total_rows").cast("double"))
            .as("share"),
          col("total_rows"), col("n_keys")),
      counts)
  }

  /** EXACT pre-join cardinality probe — answer "how big would this join
    * be?" WITHOUT materializing it: `|A ⋈ B| = Σ_k cntA(k)·cntB(k)`
    * over the shared keys, so a fanout bomb (the q130 skew class) is a
    * cheap count-table join instead of a cluster-filling surprise. Also
    * reports the single worst key's output rows — the number that
    * decides between a plain join, a salted join, and a redesign.
    *
    * Output (one row): (n_keys_a, n_keys_b, n_keys_common, rows_a,
    * rows_b, join_rows, max_key_rows) — join_rows exact in
    * DECIMAL(38,0) reported as a long (a probe that overflows LONG is
    * itself the loudest possible answer, so the cast is intentional:
    * Spark ANSI mode throws rather than wraps). NULL keys never join
    * (SQL semantics) and are excluded from both count tables.
    *
    * Scale: one map-side-combined count per side (each collapses its
    * input to the key space), an inner join of the two COUNT TABLES
    * keyed by the join key, and 1-row aggregates broadcast together —
    * the data rows themselves are never joined. */
  def joinSizeProbe(a: DataFrame, keyA: String, b: DataFrame,
      keyB: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val ca = a.filter(col(keyA).isNotNull)
      .groupBy(col(keyA).as("__k")).agg(count(lit(1)).as("__na"))
    val cb = b.filter(col(keyB).isNotNull)
      .groupBy(col(keyB).as("__k")).agg(count(lit(1)).as("__nb"))
    val sa = ca.agg(count(lit(1)).as("n_keys_a"),
      sum("__na").cast("long").as("rows_a"))
    val sb = cb.agg(count(lit(1)).as("n_keys_b"),
      sum("__nb").cast("long").as("rows_b"))
    val joined = ca.join(cb, "__k")
      .agg(count(lit(1)).as("n_keys_common"),
        coalesce(sum((col("__na") * col("__nb")).cast(dec)), lit(0))
          .cast(dec).as("__jr"),
        coalesce(max((col("__na") * col("__nb")).cast(dec)), lit(0))
          .cast(dec).as("__mk"))
    joined.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n_keys_a"), col("n_keys_b"), col("n_keys_common"),
        col("rows_a"), col("rows_b"),
        col("__jr").cast("long").as("join_rows"),
        col("__mk").cast("long").as("max_key_rows"))
  }
}
