package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped discontinuous percentiles (SQL `percentile_disc`
  * semantics: the smallest actual data value whose cumulative distribution
  * reaches `p` — NO interpolation, so the result is always a value drawn
  * from the data and bit-exact across engines; `percentile_cont`'s
  * interpolation arithmetic is engine-ordering-sensitive and is why the
  * reference-style approx sketches can't be hash-verified).
  *
  * Implementation is a distributed rank, not a buffering aggregate: Spark's
  * own `percentile`/`percentile_disc` aggregates collect every group value
  * into one executor buffer — a single hot group OOMs the executor at
  * 100 TB. Here the per-group sort is a window exchange (range-partitioned
  * within the hash-partitioned group, AQE-splittable) and each percentile
  * is a conditional `min` over the single row whose rank equals
  * `ceil(p * n)` — the shuffle after the window carries one row per group
  * per percentile candidate, not the group's values.
  */
object Quantiles {

  /** Per-`groupCol` exact disc percentiles of `valueCol` at each `ps`
    * (0 < p <= 1). `tieBreak` makes the within-group order total (ties on
    * the value don't affect the selected VALUE, but a total order keeps
    * the plan deterministic under retries). Output:
    * `(groupCol, n, p_<label> ...)` — one column per requested percentile,
    * labeled with the percent as an integer (p50, p90, p99).
    */
  def discPercentiles(
      df: DataFrame, groupCol: String, valueCol: String, tieBreak: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"percentiles must be in (0, 1], got $ps")
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieBreak))
    val ranked = df
      .select(col(groupCol), col(valueCol), col(tieBreak))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val pCols = ps.map { p =>
      val label = "p" + math.round(p * 100)
      min(when(col("__rn") === ceil(lit(p) * col("__n")), col(valueCol)))
        .as(label)
    }
    ranked.groupBy(groupCol)
      .agg(max(col("__n")).cast("long").as("n"), pCols: _*)
  }

  /** Exact GLOBAL equal-depth binning (ANSI `NTILE(n)` semantics: bucket
    * sizes differ by at most one, earlier buckets take the remainder) —
    * without the single-partition sort `ntile(n) OVER (ORDER BY ...)`
    * costs: the global rank is the two-phase range-partition + broadcast
    * per-partition offsets recipe ([[graft.operators.SamplingOps
    * .budgetSelect]] / zipfFit), so the sort work stays parallel.
    *
    * Equal-DEPTH bins are the curriculum/batching complement of the
    * equal-width histogram sketch: "split the corpus into n equally-sized
    * length tiers" is how length-stratified batch sampling and
    * quantile-capped mixtures are built.
    *
    * With N rows, q = N div n and r = N mod n: ranks 1..(q+1)r fill the
    * first r buckets (size q+1), the rest fill buckets r+1..n (size q) —
    * integer arithmetic only, so any engine reproduces it bit-for-bit.
    *
    * Output: input columns + `bucket` (1-based). */
  /** Two-phase exact global rank under a total `order`: range-partition +
    * sort within partitions, read the partition-local position straight
    * out of monotonically_increasing_id (partition id in the upper 31
    * bits, sequential row offset in the lower 33) — unlike a
    * `Window.partitionBy(__pid)` rank, this adds NO second full-data
    * exchange (Catalyst can't see that range partitions already cluster
    * __pid, so the window form re-shuffles everything by pid hash). The
    * only unkeyed window runs over the partition-count-sized offsets
    * table, never data rows. Persisted so both the offsets branch and
    * the output read one materialization of the (nondeterministic) ids.
    * PLAN-OWNED CACHE (tier 2, see operators/Caching.scala): the
    * returned corpus-sized plan re-reads this table, so the operator
    * cannot unpersist it; lifetime belongs to the returned Dataset
    * (ContextCleaner) or the caller's cache cleanup.
    *
    * Output: input columns + `__grank` (1-based) + `__total`. */
  private[operators] def globalRank(
      df: DataFrame, order: Seq[Column]): DataFrame = {
    val sized = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__lrk", (col("__mid") % (1L << 33)) + 1L)
      .drop("__mid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pidW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(pidW), lit(0L)))
      .withColumn("__total", sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__total")
    sized.join(broadcast(offsets), "__pid")
      .withColumn("__grank", col("__lrk") + col("__off"))
      .drop("__pid", "__off", "__lrk")
  }

  /** Exact integer floor division of non-negative longs (Column./ is
    * double division; a % b keeps this in pure integer arithmetic). */
  private[operators] def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  def globalNtile(
      df: DataFrame, valueCol: String, tieBreak: String,
      n: Int): DataFrame = {
    require(n > 0, s"ntile buckets must be positive: $n")
    val ranked = globalRank(df, Seq(col(valueCol), col(tieBreak)))
    val q = idiv(col("__total"), lit(n.toLong))
    val r = col("__total") % n
    val rank = col("__grank")
    val bucket = when(rank <= (q + 1) * r,
      idiv(rank - 1, q + 1) + 1)
      .otherwise(idiv(rank - 1 - (q + 1) * r, greatest(q, lit(1L))) + r + 1)
    ranked
      .withColumn("bucket", bucket.cast("int"))
      .drop("__total", "__grank")
  }

  /** Reliability/calibration curve: bucket a score column into `n`
    * equal-depth tiers ([[globalNtile]] — exact, no global sort) and
    * report the positive-outcome rate per tier. A score is calibrated
    * when pos_rate rises monotonically with the bucket; flat curves mean
    * the score carries no signal. Output per bucket:
    * (bucket, n, n_pos, pos_rate) — rate the one double division. */
  def calibrationCurve(df: DataFrame, scoreCol: String,
      outcomeCol: String, tieBreak: String, n: Int): DataFrame = {
    globalNtile(df, scoreCol, tieBreak, n)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col(outcomeCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n").cast("double"))
  }
}
