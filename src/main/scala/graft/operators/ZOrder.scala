package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering for written layouts — the
  * multi-dimensional analog of `sortWithinPartitions` that Delta/Iceberg
  * expose as OPTIMIZE ZORDER, built here from plain Spark primitives
  * (reference analog: none — the reference's layout story stops at
  * coordinate sort; this serves the same purpose for the 100 TB lake:
  * after z-ordering on the columns queries filter by, parquet row-group
  * min/max stats are TIGHT on every clustered dimension, so predicate
  * pushdown prunes row groups for filters on ANY of them, not just the
  * primary sort key).
  *
  * Mechanics: each dimension is linearly bucketed to `bitsPerDim` bits
  * inside its observed [min, max] (one bounded stats aggregate — 2·d
  * doubles to the driver), the bucket bits are interleaved into one long
  * z-value with a per-bit unrolled expression (pure codegen arithmetic,
  * no UDF), and the frame is range-partitioned then sorted by that
  * z-value. Ties/NaN/null map to bucket 0 — they cluster together at the
  * curve origin.
  */
object ZOrder {

  /** Interleave `cols` (numeric) into a Morton z-value Column. `mins` and
    * `maxs` are the per-column bounds used for bucketing (callers get
    * them from one `agg`; exact bounds are NOT required for correctness —
    * only clustering quality). */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bitsPerDim: Int = 16): Column = {
    require(cols.nonEmpty && cols.length <= 4, "z-order supports 1-4 dims")
    require(cols.length * bitsPerDim <= 62, "z-value must fit a long")
    val d = cols.length
    val maxBucket = (1L << bitsPerDim) - 1
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val lo = mins(i)
      val hi = maxs(i)
      val scale = if (hi > lo) maxBucket.toDouble / (hi - lo) else 0.0
      val b = floor((c.cast("double") - lo) * scale).cast("long")
      least(greatest(coalesce(b, lit(0L)), lit(0L)), lit(maxBucket))
    }
    // per-bit unrolled interleave: bit j of dim i lands at j*d + i
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bitsPerDim
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * d + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to parquet clustered on `cols`: stats pass → z-value →
    * `repartitionByRange` (range exchange samples the z distribution, so
    * output files tile the curve) → within-partition sort → write.
    * `numFiles` bounds output file count (at 100 TB pick
    * input-size / target-file-size). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bitsPerDim: Int = 16): Unit = {
    val aggCols = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    val mins = cols.indices.map(i => Option(stats.get(2 * i))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val maxs = cols.indices.map(i => Option(stats.get(2 * i + 1))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    df.withColumn("__z",
        zValue(cols.map(col), mins, maxs, bitsPerDim))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
