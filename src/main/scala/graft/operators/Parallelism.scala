package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LeafNode, LogicalPlan, Project, Repartition, SubqueryAlias}

/** Guarded scan fan-out for compute-heavy per-row stages.
  *
  * A small parquet input (one file, one row group) scans as a single
  * partition, so an expensive narrow stage above it — a signature UDF, a
  * window explode, a media decode — runs on one core no matter how many the
  * session has. At real scale (100 TB) inputs arrive in thousands of
  * splits and no help is needed; the fix must therefore be conditional,
  * not a blanket repartition (which at scale would add a full-input
  * shuffle, or worse, SHRINK a well-partitioned input to
  * `defaultParallelism`).
  *
  * `fanOut` hash-repartitions on the caller's key ONLY when the plan's
  * initial partitioning is below the session's default parallelism. Hash
  * (not round-robin) repartitioning avoids the deterministic-retry local
  * sort round-robin inserts, and keeps the exchange identical across
  * branches so self-join consumers get exchange reuse.
  */
private[graft] object Parallelism {

  /** `df` repartitioned to `defaultParallelism` by `key` iff its initial
    * partition count is lower; unchanged otherwise.
    *
    * The partition-count probe (`df.rdd.getNumPartitions`) is only safe on
    * scan-shaped plans: under AQE, `.rdd` on a plan containing exchanges
    * EXECUTES those stages eagerly at declaration time, and the outer query
    * would re-run them (no cross-QueryExecution stage reuse). So any plan
    * with a shuffle upstream passes through untouched — it already has
    * >= `spark.sql.shuffle.partitions` parallelism anyway. */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df // micro-batch parallelism is the source's
    if (!scanShaped(df.queryExecution.optimizedPlan)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }

  /** Leaf + Project/Filter chains (plus shuffle-free coalesce): plans whose
    * RDD can be built without running a job. */
  private def scanShaped(plan: LogicalPlan): Boolean = plan match {
    case p: Project                       => scanShaped(p.child)
    case f: Filter                        => scanShaped(f.child)
    case a: SubqueryAlias                 => scanShaped(a.child)
    case r: Repartition if !r.shuffle     => scanShaped(r.child)
    case _: LeafNode                      => true
    case _                                => false
  }
}
