package graft.operators

import org.apache.spark.sql.DataFrame
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
}
