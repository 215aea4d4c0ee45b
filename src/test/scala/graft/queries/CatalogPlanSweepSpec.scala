package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical._

/** Catalog-wide plan-shape gate (VERDICT r13 next-round #8): the
  * per-batch PlanSpec pins each new operator's shape, but nothing
  * re-checked OLD queries as the optimizer, the operators, or Spark
  * itself moved. This sweep walks EVERY declared query's plan at the
  * smallest SF and asserts the two scale invariants the repo's designs
  * rely on, so future operators inherit the gate automatically:
  *
  *  1. no CartesianProductExec anywhere (every intentional crossJoin in
  *     the codebase is against a broadcast 1-row aggregate, which plans
  *     as BroadcastNestedLoopJoin, never CartesianProduct);
  *  2. every UNKEYED window (empty PARTITION BY — a single-task sort at
  *     execution) rides an input that is provably bounded: its subtree
  *     must contain an Aggregate / GlobalLimit / LocalRelation, i.e. a
  *     distinct-value grid, a top-k, or a literal table — never raw
  *     data rows (the percent-rank/ksDrift class of scale-killer).
  */
class CatalogPlanSweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("all catalog plans: no cartesian product, unkeyed windows only " +
      "over bounded (aggregated/limited/literal) inputs") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"driver testdata missing at $sfDir")
    val violations = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs =
          try {
            val df = fn(spark, sfDir)
            val physical = df.queryExecution.executedPlan.toString
            val cart =
              if (physical.contains("CartesianProduct"))
                Seq(s"$name: CartesianProduct in physical plan")
              else Nil
            val rawUnkeyed = df.queryExecution.optimizedPlan.collect {
              case w: Window if w.partitionSpec.isEmpty &&
                  !w.child.exists {
                    case _: Aggregate | _: GlobalLimit |
                        _: LocalRelation => true
                    case _ => false
                  } =>
                s"$name: unkeyed Window over un-aggregated input " +
                  s"(${w.windowExpressions.map(_.name).mkString(",")})"
            }
            cart ++ rawUnkeyed
          } catch {
            case e: Throwable =>
              Seq(s"$name: plan construction failed: " +
                s"${e.getClass.getSimpleName}: " +
                String.valueOf(e.getMessage).take(200))
          }
        // release operator-internal persists between queries (the
        // CatalogSelfCheckSpec hygiene)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        vs
    }
    assert(violations.isEmpty,
      s"\n${violations.size} plan-shape violations:\n" +
        violations.mkString("\n"))
  }
}
