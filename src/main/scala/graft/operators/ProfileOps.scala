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

  /** Filter-impact waterfall for an ORDERED quality pipeline: for each
    * named keep-predicate, how many rows fail it at all (`n_fail`, rule
    * evaluated in isolation), how many are REMOVED BY it when the rules
    * run in order (`n_first_fail` — the row passed every earlier rule;
    * these sum to total minus survivors, giving each rule its marginal
    * head-count), and how many rows survive the pipeline up to and
    * including it (`n_surviving`, non-increasing). The report that
    * answers "which filter is actually eating my corpus" before anyone
    * re-tunes thresholds — isolation counts alone mislead when rules
    * overlap. A NULL predicate value counts as a failure (unknown is not
    * a pass), normalized identically on the oracle side.
    *
    * Output: one row per rule, in pipeline order:
    * (rule_order, rule, n_fail, n_first_fail, n_surviving).
    *
    * Scale: ONE map-side-combined aggregation over the data computing
    * 3 x |rules| conditional sums; the long-format explode runs on the
    * single result row. No shuffle wider than |rules| scalars. */
  def filterWaterfall(df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1)}")
    val pass = rules.map { case (_, p) => coalesce(p, lit(false)) }
    val aggs = rules.indices.flatMap { i =>
      val firstFail = pass.take(i).foldLeft(!pass(i))((a, p) => a && p)
      val surviving = pass.take(i + 1).reduce(_ && _)
      Seq(sum(when(!pass(i), 1L).otherwise(0L)).as(s"__f$i"),
        sum(when(firstFail, 1L).otherwise(0L)).as(s"__ff$i"),
        sum(when(surviving, 1L).otherwise(0L)).as(s"__s$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.indices.map { i =>
      struct(lit(i + 1).as("rule_order"), lit(rules(i)._1).as("rule"),
        coalesce(col(s"__f$i"), lit(0L)).as("n_fail"),
        coalesce(col(s"__ff$i"), lit(0L)).as("n_first_fail"),
        coalesce(col(s"__s$i"), lit(0L)).as("n_surviving"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select("__r.*")
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

  /** Functional-dependency violation audit: determinant values of
    * `detCol` mapped to MORE than one distinct `depCol` value — the
    * "should-be-a-key / should-be-derivable" check (deequ's uniqueness
    * family) run before trusting a denormalized feed: if
    * `l_partkey -> l_suppkey` was assumed and this returns rows, a join
    * somewhere is fanning out. Top-`k` worst offenders by distinct-count,
    * deterministic (n_distinct_dep DESC, det) order.
    *
    * Output: (det, n_rows, n_distinct_dep) — violating determinants only.
    *
    * Scale: one exact count-distinct aggregation keyed by the
    * determinant (partial counts combine map-side; the distinct is the
    * [[pkAudit]]-family price), then a TakeOrdered head — never a global
    * sort. */
  def fdViolations(df: DataFrame, detCol: String, depCol: String,
      k: Int = 20): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.groupBy(col(detCol).as("det"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(depCol)).as("n_distinct_dep"))
      .filter(col("n_distinct_dep") > 1)
      .orderBy(col("n_distinct_dep").desc, col("det"))
      .limit(k)
  }

  /** Snapshot-to-snapshot profile drift: [[profileColumns]] on both
    * sides, full-outer-joined per column — the "did the upstream break
    * the feed" gate a pipeline runs before promoting a new snapshot.
    * `status` is 'added' / 'removed' / 'common'; for common columns the
    * null-rate movement ships as an exact integer permille delta
    * (per-side `n_nulls*1000 div n_rows`, then the difference — positive
    * = the new snapshot is MORE null) and the cardinality movement as a
    * signed count delta. Absent-side metrics are NULL, not zero — a
    * removed column's "null rate" is not a number.
    *
    * Output: (col_name, status, n_rows_a, n_nulls_a, n_distinct_a,
    * n_rows_b, n_nulls_b, n_distinct_b, null_delta_permille,
    * distinct_delta).
    *
    * Scale: one single-scan Expand profile per snapshot (the
    * [[profileColumns]] shape), then a join of two |cols|-row relations
    * — nothing wider than the profiles themselves moves. */
  def profileDrift(a: DataFrame, colsA: Seq[String],
      b: DataFrame, colsB: Seq[String]): DataFrame = {
    val pa = profileColumns(a, colsA).select(col("col_name"),
      col("n_rows").as("n_rows_a"), col("n_nulls").as("n_nulls_a"),
      col("n_distinct").as("n_distinct_a"))
    val pb = profileColumns(b, colsB).select(col("col_name"),
      col("n_rows").as("n_rows_b"), col("n_nulls").as("n_nulls_b"),
      col("n_distinct").as("n_distinct_b"))
    pa.join(pb, Seq("col_name"), "full_outer")
      .withColumn("status",
        when(col("n_rows_a").isNull, lit("added"))
          .when(col("n_rows_b").isNull, lit("removed"))
          .otherwise(lit("common")))
      .withColumn("null_delta_permille",
        expr("n_nulls_b * 1000L div n_rows_b") -
          expr("n_nulls_a * 1000L div n_rows_a"))
      .withColumn("distinct_delta", col("n_distinct_b") - col("n_distinct_a"))
      .select("col_name", "status", "n_rows_a", "n_nulls_a",
        "n_distinct_a", "n_rows_b", "n_nulls_b", "n_distinct_b",
        "null_delta_permille", "distinct_delta")
  }

  /** Single-scan numeric profile of integer (cents) columns: per
    * column, null count, min/max, exact sum, and mean/variance as EXACT
    * integer floors from DECIMAL(38,0) power sums — the numeric
    * companion of [[profileColumns]] (which censuses
    * nulls/cardinality/blankness but says nothing about magnitudes).
    * Integer floors, not doubles, because the power sums pass 2^53 at
    * scale and a non-correctly-rounded big-integer→double cast (DuckDB's
    * HUGEINT path measurably is one) would make a float chain
    * engine-DEPENDENT in its last ulp; `floor((c·Σx² − (Σx)²) / c²)` is
    * pure integer arithmetic any engine replays — and a cents-scale
    * variance loses nothing to the floor. An all-null column reports
    * NULL stats.
    *
    * Output per column: (col_name, n_rows, n_nulls, min_v, max_v,
    * sum_v, mean_v, variance_v).
    *
    * Scale: ONE aggregation pass computes 5·|cols| scalars (map-side
    * combined); the long-format explode runs on the single result row. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val aggs = cols.flatMap { c =>
      val x = col(c).cast("long")
      Seq(count(col(c)).as(s"__c_$c"),
        min(x).as(s"__mn_$c"), max(x).as(s"__mx_$c"),
        sum(x.cast(dec)).cast(dec).as(s"__s1_$c"),
        sum((x.cast(dec) * x).cast(dec)).cast(dec).as(s"__s2_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    def idiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ((a - pmod(a, b)) / b).cast("long")
    row.select(explode(array(cols.map { c =>
        val cnt = col(s"__c_$c").cast(dec)
        val s1 = col(s"__s1_$c")
        val s2 = col(s"__s2_$c")
        struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__c_$c")).as("n_nulls"),
          col(s"__mn_$c").as("min_v"),
          col(s"__mx_$c").as("max_v"),
          s1.cast("long").as("sum_v"),
          when(col(s"__c_$c") === 0, lit(null).cast("long"))
            .otherwise(idiv(s1, cnt)).as("mean_v"),
          when(col(s"__c_$c") === 0, lit(null).cast("long"))
            .otherwise(idiv((cnt * s2 - s1 * s1).cast(dec),
              (cnt * cnt).cast(dec))).as("variance_v"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Per-column value-distribution drift between two snapshots — the
    * content complement of [[profileDrift]] (which sees nulls and
    * cardinality but not WHICH values shifted): each column's values
    * hash into `buckets` fnv1a64 buckets (power of two, so the bucket
    * is the hash's low bits — identical under signed and unsigned
    * views, hence replayable by an unsigned-arithmetic oracle; NULL is
    * its own bucket), and the per-column PSI over the bucket grids is
    * the [[CorpusCompareOps.psiReport]] quantized-ln chain. Values are
    * hashed via their STRING form — use string/integer columns (or
    * pre-cast) so the rendering is engine-neutral.
    *
    * Output per column: (col_name, n_ref, n_cur, psi).
    *
    * Scale: one explode-to-(col, bucket) count per side (map-side
    * combined, grid bounded by |cols|·(buckets+1)), a full-outer grid
    * join, per-column totals via a window keyed on the bounded grid. */
  def columnDrift(a: DataFrame, b: DataFrame, cols: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(cols.nonEmpty, "columnDrift needs at least one column")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two (signed/unsigned low bits agree" +
        s"), got $buckets")
    def grid(df: DataFrame, as: String): DataFrame = df
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          when(col(c).isNull, lit(-1L))
            .otherwise(pmod(
              graft.functions.GraftFunctions.fnv1a64(col(c).cast("string")),
              lit(buckets.toLong))).as("bucket"))
      }: _*)).as("p"))
      .select("p.*")
      .groupBy("col_name", "bucket").agg(count(lit(1)).as(as))
    val g = grid(a, "n_ref").join(grid(b, "n_cur"),
        Seq("col_name", "bucket"), "full_outer")
      .select(col("col_name"), col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("col_name")
    val p = (col("n_ref") + lit(1)).cast("double") /
      (col("__tr") + col("__nb")).cast("double")
    val q = (col("n_cur") + lit(1)).cast("double") /
      (col("__tc") + col("__nb")).cast("double")
    g.withColumn("__tr", sum("n_ref").over(w))
      .withColumn("__tc", sum("n_cur").over(w))
      .withColumn("__nb", count(lit(1)).over(w))
      .select(col("col_name"), col("__tr"), col("__tc"),
        floor((p - q) * log(p / q) * lit(1e7) + lit(0.5)).cast("long")
          .as("__pq"))
      .groupBy("col_name")
      .agg(max("__tr").as("n_ref"), max("__tc").as("n_cur"),
        sum("__pq").as("__s"))
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        (col("__s").cast("double") / lit(1e7)).as("psi"))
  }

  /** Schema discovery over a semi-structured JSON column — the profile
    * every pipeline needs before it trusts a `props`/`payload` field:
    * which keys exist, how often, with what value types, and at what
    * cardinality. Flat keys only (nested objects/arrays are counted as
    * `n_nested`, not descended into — profile the extracted subcolumn
    * next if one matters).
    *
    * Per top-level key: presence count, presence permille of all rows
    * (exact integer division), distinct value count, and a type census
    * of the value strings (`null` / `true|false` / JSON number / nested
    * `{`/`[` / plain string). Malformed or NULL JSON rows are counted
    * once in every output row's `n_bad` (they contribute no keys).
    *
    * Determinism: values come from `from_json(… map<string,string>)` —
    * one native parse per row, no UDF; numbers/arrays re-serialize to
    * their minified JSON form, so counts and distincts are
    * engine-replayable against a JSON-native oracle.
    *
    * Output per key: (key, n_present, present_permille, n_distinct,
    * n_null, n_bool, n_num, n_nested, n_str, n_rows, n_bad).
    *
    * Scale: one parse + explode pass, ONE map-side-combined aggregation
    * keyed by the bounded key space, plus a 1-row (count, bad-count)
    * aggregate broadcast onto the key rows. */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val parsed = df.select(
      from_json(col(jsonCol),
        org.apache.spark.sql.types.DataTypes.createMapType(
          StringType, StringType)).as("__m"))
    val tot = parsed.agg(count(lit(1)).as("n_rows"),
      sum(when(col("__m").isNull, 1L).otherwise(0L)).as("n_bad"))
    val v = col("__v")
    val isNum =
      v.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$")
    val kv = parsed.filter(col("__m").isNotNull)
      .select(explode(col("__m")).as(Seq("key", "__v")))
    kv.groupBy("key")
      .agg(count(lit(1)).as("n_present"),
        countDistinct(col("__v")).as("n_distinct"),
        sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(v.isin("true", "false"), 1L).otherwise(0L)).as("n_bool"),
        sum(when(v.isNotNull && isNum, 1L).otherwise(0L)).as("n_num"),
        sum(when(v.startsWith("{") || v.startsWith("["), 1L)
          .otherwise(0L)).as("n_nested"),
        sum(when(v.isNotNull && !v.isin("true", "false") && !isNum &&
          !v.startsWith("{") && !v.startsWith("["), 1L).otherwise(0L))
          .as("n_str"))
      .crossJoin(broadcast(tot))
      .withColumn("present_permille",
        expr("n_present * 1000L div n_rows"))
      .select("key", "n_present", "present_permille", "n_distinct",
        "n_null", "n_bool", "n_num", "n_nested", "n_str", "n_rows",
        "n_bad")
  }
}
