package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deequ-style table profiling: per-column completeness / cardinality /
  * blankness in ONE aggregation pass — the data-quality report a
  * pipeline runs on every new snapshot before trusting it downstream.
  *
  * Scale note: exact `count_distinct` over several columns plans as one
  * Expand (rows x columns into a single shuffle) — the standard price of
  * an exact profile, paid once per snapshot. For always-on monitoring at
  * 100 TB use the [[SketchOps]] HLL family instead and accept the
  * estimate. */
object ProfileOps {

  /** Profile `cols`: (col_name, n_rows, n_nulls, n_distinct, n_blank) —
    * n_blank counts whitespace-only strings (0 for non-string columns);
    * n_distinct counts non-null distinct values. Long format, one row
    * per column, stacked from the single aggregation row. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs = cols.flatMap { c =>
      val blank = df.schema(c).dataType match {
        case StringType =>
          sum(when(trim(col(c)) === "", 1L).otherwise(0L))
        case _ => sum(lit(0L))
      }
      Seq(count(col(c)).as(s"__c_$c"),
        count_distinct(col(c)).as(s"__d_$c"),
        blank.as(s"__b_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__c_$c")).as("n_nulls"),
        col(s"__d_$c").as("n_distinct"),
        coalesce(col(s"__b_$c"), lit(0L)).as("n_blank"))): _*))
        .as("p"))
      .select("p.*")
  }

  /** Referential-integrity audit: rows of `child` whose `childKey` has
    * no match in `parent.parentKey` (NULL child keys count as orphans —
    * they can never join). One row:
    * (n_child_rows, n_orphans, orphan_rate).
    *
    * Scale: the join runs on the two key PROJECTIONS (parent distinct
    * first, broadcastable when the dimension is small); no payload
    * column ever shuffles. */
  def fkAudit(child: DataFrame, parent: DataFrame, childKey: String,
      parentKey: String): DataFrame = {
    val c = child.select(col(childKey).as("__k"))
    val p = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    c.join(p, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .withColumn("orphan_rate",
        col("n_orphans").cast("double") / col("n_child_rows").cast("double"))
  }

  /** Primary-key uniqueness audit over `keyCols`: one row
    * (n_rows, n_keys, n_dup_keys, n_dup_rows, dup_rate) — the
    * [[kAnonymityReport]] shape pointed at k = 2. NULL key components
    * group together (SQL GROUP BY semantics, both engines). */
  def pkAudit(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__kn"))
      .agg(sum("__kn").as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("__kn") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        sum(when(col("__kn") > 1, col("__kn")).otherwise(0L))
          .as("n_dup_rows"))
      .withColumn("dup_rate",
        col("n_dup_rows").cast("double") / col("n_rows").cast("double"))
  }
}
