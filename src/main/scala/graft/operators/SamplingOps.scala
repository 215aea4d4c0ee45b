package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deterministic sampling / domain-mixing operators for training-data
  * pipelines (SURVEY.md §7 step 10 extensions).
  *
  * A pretraining corpus is assembled by RE-WEIGHTING heterogeneous sources
  * (the "data mixture" of the GPT-3 / Gopher / LLaMA papers): each domain
  * is down-sampled to hit a target weight. At 100 TB the sample decision
  * must be (a) per-row with no shuffle, (b) deterministic across runs,
  * retries, and cluster sizes — `DataFrame.sample` is none of those
  * (partition-seeded RNG changes with repartitioning). Here the decision
  * is a pure hash of the row's own key: keep iff
  * `uniform(key) = (fnv1a64(key || salt) >>> 11) / 2^53 < rate`.
  * The >>> 11 keeps the top 53 bits, so the double is exact and the same
  * arithmetic is expressible in any engine (the DuckDB oracle replays it
  * bit-for-bit; salt switching yields independent samples).
  */
object SamplingOps {

  /** Deterministic uniform in [0,1) from a key column + salt — exact
    * 53-bit double, codegen-native ([[GraftFunctions.fnv1a64]] is a custom
    * Catalyst expression with doGenCode). */
  def uniformHash(key: Column, salt: String): Column =
    (shiftrightunsigned(
      GraftFunctions.fnv1a64(concat(key.cast("string"), lit(":" + salt))), 11)
      .cast("double") / lit(9007199254740992.0)) // 2^53

  /** Per-stratum deterministic Bernoulli sample: keep a row iff its hash
    * uniform is below the stratum's rate. Strata absent from `rates` use
    * `defaultRate`. Pure filter — no shuffle, no state. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val rateExpr = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(uniformHash(col(keyCol), salt) < rateExpr)
  }

  /** Per-stratum keep-rates that realize target mixture `weights` at the
    * LARGEST achievable corpus size: with stratum counts c_s and weights
    * w_s (sum 1), the bottleneck stratum is argmin c_s/w_s, kept whole;
    * every other stratum is down-sampled to rate_s = w_s * T / c_s where
    * T = min_s(c_s / w_s). Strata not in `weights` are dropped (rate 0 by
    * omission from the result).
    *
    * Returns (stratum, n, rate). The aggregation output is one row per
    * stratum — bounded by the domain count, never by data size — and the
    * global min is an in-plan cross join of a 1-row aggregate, so the
    * whole computation stays distributed (no driver collect). */
  def mixingRates(
      df: DataFrame,
      strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("__stratum", "__w")
    val counts = df.groupBy(col(strataCol).as("__stratum"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(wdf), "__stratum")
    val tmin = counts.agg(min(col("n") / col("__w")).as("__t"))
    counts.crossJoin(broadcast(tmin))
      .select(col("__stratum").as(strataCol), col("n"),
        least(lit(1.0), col("__w") * col("__t") / col("n")).as("rate"))
  }

  /** Down-sample `df` to the target domain mixture: [[mixingRates]] joined
    * back (broadcast — one row per stratum) and applied as the same
    * deterministic hash filter as [[stratifiedSample]]. Strata without a
    * weight are dropped. */
  def mixToWeights(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weights: Map[String, Double],
      salt: String = "graft"): DataFrame = {
    val rates = mixingRates(df, strataCol, weights).drop("n")
    df.join(broadcast(rates), Seq(strataCol))
      .filter(uniformHash(col(keyCol), salt) < col("rate"))
      .drop("rate")
  }
}
