package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Label-quality and calibration audits for labeled / model-scored
  * corpora — the QA a training-data pipeline runs on its LABELS, next
  * to the corpus-content audits (Gopher/C4 quality, dedup): is the
  * annotation layer itself trustworthy, and do the model's confidence
  * scores mean what they claim?
  *
  * Engine-parity conventions as everywhere (queries/Q.scala): exact
  * integer counts and cross-multiplied comparisons inside the
  * aggregations, at most one double division per output column.
  */
object LabelQaOps {

  private val dec = DecimalType(38, 0)

  /** Split-conformal calibration audit: from a CALIBRATION frame of
    * nonconformity scores (quantized to integers by the caller — the
    * ksDrift caller-quantizes contract), the conformal threshold at
    * miscoverage `alphaPermille` is the k-th smallest calibration
    * score with `k = ceil((n_cal + 1) · (1000 − alphaPermille) /
    * 1000)` (clamped to n_cal — the finite-sample +1 of split
    * conformal prediction, Vovk et al.; Lei et al. 2018). The EVAL
    * frame then reports achieved coverage: the permille of eval scores
    * ≤ threshold. A calibrated pipeline reads
    * `coverage_permille ≈ 1000 − alphaPermille`; a drifted scorer
    * under-covers and ships broken prediction sets.
    *
    * Output (one row): (n_cal, threshold, n_eval, n_covered,
    * coverage_permille) — threshold NULL (and coverage 0) when the
    * calibration frame is empty.
    *
    * Scale: both sides collapse to bounded score GRIDS by map-side
    * combined counts (the running-rank selection rides an unkeyed
    * window, so the grid carries the ksFromCounts self-defending
    * bound — an unquantized double score column fails loudly); the
    * threshold broadcasts onto the eval grid's 1-row census. Never a
    * sort or window over raw rows. */
  def conformalCoverage(cal: DataFrame, eval: DataFrame,
      scoreCol: String, alphaPermille: Int,
      maxGridRows: Long = 1L << 20): DataFrame = {
    require(alphaPermille > 0 && alphaPermille < 1000,
      s"alphaPermille must be in (0, 1000): $alphaPermille")
    def grid(df: DataFrame): DataFrame =
      df.filter(col(scoreCol).isNotNull)
        .select(col(scoreCol).cast("long").as("__v"))
        .groupBy("__v").agg(count(lit(1)).as("__c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cg = grid(cal)
    val gn = cg.agg(count(lit(1)).as("__gn"))
    val guarded = cg.crossJoin(broadcast(gn))
      .filter(assert_true(col("__gn") <= lit(maxGridRows),
        format_string("conformalCoverage calibration grid has %s" +
          " distinct scores (max %s) — quantize the score column" +
          " (caller-quantizes contract)",
          col("__gn"), lit(maxGridRows))).isNull)
      .drop("__gn")
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // k = ceil((n+1)(1000-alpha)/1000) clamped to n; threshold = the
    // smallest score whose running count reaches k
    val thr = guarded
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(wAll))
      .withColumn("__k",
        least(expr(s"((__n + 1) * ${1000 - alphaPermille} + 999)" +
          " div 1000"), col("__n")))
      .filter(col("__cum") >= col("__k"))
      .agg(min("__v").as("threshold"), max("__n").as("n_cal"))
    val eg = grid(eval)
    // both censuses are 1-row; an empty eval frame must not erase the
    // calibration row, so the final shape is thr x (eval census)
    val ec = eg.crossJoin(broadcast(thr))
      .agg(sum("__c").as("__ne"),
        sum(when(col("__v") <= col("threshold"), col("__c"))
          .otherwise(0L)).as("__nc"))
    val out = thr.crossJoin(broadcast(ec))
      .select(coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        col("threshold"),
        coalesce(col("__ne"), lit(0L)).as("n_eval"),
        coalesce(col("__nc"), lit(0L)).as("n_covered"),
        when(coalesce(col("__ne"), lit(0L)) === 0, lit(null))
          .otherwise(expr("coalesce(__nc, 0) * 1000 div __ne"))
          .cast("long").as("coverage_permille"))
    Caching.materializeAndRelease(out, cg, eg)
  }

  /** Expected-calibration-error report — the reliability audit over a
    * model's STATED confidence (the complement of
    * [[Quantiles.calibrationCurve]], which tiers by score QUANTILE):
    * fixed-width confidence bins over `confPermilleCol` (integer
    * permille in [0, 1000]), each bin reporting its exact mean stated
    * confidence, its exact observed accuracy, and the |gap|; every row
    * also carries the one-number ECE = Σ_b n_b·|acc_b − conf_b| div n
    * (all integer-floor divisions — engine-identical). An honest model
    * reads gap ≈ 0 everywhere; overconfidence shows as acc < conf in
    * the top bins.
    *
    * Output per bin: (bin, n, conf_permille, acc_permille,
    * gap_permille, ece_permille).
    *
    * Scale: ONE map-side-combined census of the bounded `bins` grid
    * (sums add, so the grid phase doubles as complete-mode streaming
    * state — [[graft.streaming.EventStreams.streamingCalibrationCounts]]
    * delegates to it); the ECE total is a broadcast 1-row re-aggregate
    * of the grid. */
  def calibrationBins(df: DataFrame, confPermilleCol: String,
      correctCol: String, bins: Int = 10): DataFrame =
    calibrationFromCounts(
      calibrationCounts(df, confPermilleCol, correctCol, bins))

  /** The mergeable (bin, n, sum_conf, n_correct) grid phase of
    * [[calibrationBins]] — one definition, the shared-phase rule. */
  def calibrationCounts(df: DataFrame, confPermilleCol: String,
      correctCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val conf = col(confPermilleCol).cast("long")
    df.filter(conf.isNotNull && conf >= 0 && conf <= 1000 &&
        col(correctCol).isNotNull)
      .select(least(expr(s"cast($confPermilleCol as bigint) * $bins" +
          " div 1000"), lit(bins - 1L)).cast("int").as("bin"),
        conf.as("__conf"),
        col(correctCol).cast("boolean").as("__ok"))
      .groupBy("bin")
      .agg(count(lit(1)).as("__n"),
        sum("__conf").as("__sc"),
        sum(when(col("__ok"), 1L).otherwise(0L)).as("__nc"))
  }

  /** Finish [[calibrationBins]] from the grid: merge, exact per-bin
    * rates, broadcast ECE total. */
  def calibrationFromCounts(grid: DataFrame): DataFrame = {
    val merged = grid.groupBy("bin")
      .agg(sum("__n").as("n"), sum("__sc").as("__sc"),
        sum("__nc").as("__nc"))
      .select(col("bin"), col("n"),
        expr("__sc div n").as("conf_permille"),
        expr("__nc * 1000 div n").as("acc_permille"))
      .withColumn("gap_permille",
        abs(col("acc_permille") - col("conf_permille")))
    val tot = merged
      .agg(sum(col("n") * col("gap_permille")).as("__g"),
        sum("n").as("__t"))
      .select(expr("__g div __t").cast("long").as("ece_permille"))
    merged.crossJoin(broadcast(tot))
  }

  /** Confident-learning label-noise census (Northcutt et al. 2021's
    * counting core): with each row carrying its GIVEN label, the
    * model's PREDICTED label, and the model's confidence in that
    * prediction (integer permille), the per-class self-confidence
    * threshold `t_j` is the mean confidence over rows GIVEN class j,
    * and a row is a CONFIDENT (given=i, pred=j) cell member when its
    * confidence clears `t_{pred}`. Off-diagonal cells with large
    * `n_confident` are the candidate label errors; the grid is the
    * input to any relabel/prune policy.
    *
    * The threshold comparison is the exact integer cross-multiply
    * `conf · n_given(pred) ≥ sum_conf_given(pred)` — no division, no
    * doubles, engine-identical.
    *
    * Output per cell: (given_label, pred_label, n, n_confident) —
    * every observed (given, pred) pair appears.
    *
    * Scale: ONE map-side-combined census per class for the thresholds
    * (bounded |labels| rows, broadcast back) + ONE map-side-combined
    * census of the bounded |labels|² grid. The label columns carry the
    * usual bounded-categorical contract (the cohenKappa /
    * mutualInformationReport bound). */
  def confidentLearningGrid(df: DataFrame, givenCol: String,
      predCol: String, confPermilleCol: String): DataFrame = {
    val rows = df
      .filter(col(givenCol).isNotNull && col(predCol).isNotNull &&
        col(confPermilleCol).isNotNull)
      .select(col(givenCol).cast("string").as("__g"),
        col(predCol).cast("string").as("__p"),
        col(confPermilleCol).cast("long").as("__conf"))
    val thresholds = rows.groupBy(col("__g").as("__tg"))
      .agg(count(lit(1)).cast(dec).as("__tn"),
        sum(col("__conf").cast(dec)).cast(dec).as("__ts"))
    rows
      .join(broadcast(thresholds), rows("__p") === thresholds("__tg"),
        "left")
      .groupBy("__g", "__p")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__conf").cast(dec) * col("__tn") >= col("__ts"),
          1L).otherwise(0L)).as("n_confident"))
      .select(col("__g").as("given_label"), col("__p").as("pred_label"),
        col("n"), col("n_confident"))
  }
}
