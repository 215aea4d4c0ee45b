package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point — enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or call
  * `GraftFunctions.register(spark)` on a live session). Injects the
  * engine's native SQL functions; the extension-point plumbing for custom
  * rules/strategies lives here too (SURVEY.md §4: none are mandatory for
  * correctness — the binned interval join is a pure API-level rewrite).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.registry.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
  }
}
