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
}
