package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and timing) of named
  * gate queries. Usage: runMain graft.Explain <sfDir> <query>[,<query>…] */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .appName("graft-explain")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      names.foreach { n =>
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, dir).explain("formatted")
        // time build + action together: some operators run eagerly
        // during construction (iterative algorithms)
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"===== $n rows=$cnt time=$sec%.2f s")
      }
    } finally spark.stop()
  }
}
