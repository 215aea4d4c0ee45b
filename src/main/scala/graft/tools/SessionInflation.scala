package graft.tools

import org.apache.spark.sql.SparkSession

/** In-catalog session-inflation diagnosis (VERDICT r13 missing #2):
  * q98 triangles reads 16-18 s inside the 208-query catalog run but
  * ~9 s in a fresh JVM, and the cause was never named. This main
  * reproduces the two states in ONE process and attributes the delta:
  *
  *   phase A — fresh session: warm + 3 timed passes of the probe query;
  *   phase B — replay the catalog prefix (every query alphabetically
  *             before the probe, one forced pass each, with the same
  *             reclaim() hygiene Bench uses);
  *   phase C — re-time the probe in the now-aged session.
  *
  * Around every timed pass it snapshots the JVM counters that the three
  * candidate explanations would move: GC time (heap pressure), JIT
  * compilation time + code-cache / metaspace occupancy (codegen-class
  * accumulation, deopt/recompile churn), and Spark's own codegen
  * compile metrics. The per-pass deltas name the cost directly.
  *
  * Usage: runMain graft.tools.SessionInflation [probe] [sfDir] [nPrefix]
  */
object SessionInflation {

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }
  private def jitMs: Long =
    java.lang.management.ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime
  private def poolUsedMb(name: String): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.toLowerCase.contains(name.toLowerCase))
      .map(_.getUsage.getUsed).sum / (1024 * 1024)
  }
  private def sparkCodegenCompileMs: Long =
    (org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1e6).toLong

  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("q98_triangle_count")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val nPrefix = args.lift(2).map(_.toInt).getOrElse(Int.MaxValue)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def reclaim(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    def force(name: String): Unit =
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
      catch { case e: Throwable =>
        System.err.println(s"$name failed: ${e.getClass.getSimpleName}") }

    def timedPass(tag: String): Double = {
      val (g0, j0, c0) = (gcMs, jitMs, sparkCodegenCompileMs)
      val t0 = System.nanoTime()
      force(probe)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"phase":"$tag","sec":$sec%.2f,"gc_ms":${gcMs - g0},""" +
        f""""jit_ms":${jitMs - j0},"codegen_compile_ms":${
          sparkCodegenCompileMs - c0},""" +
        f""""codecache_mb":${poolUsedMb("CodeHeap")},""" +
        f""""metaspace_mb":${poolUsedMb("Metaspace")},""" +
        f""""heap_used_mb":${java.lang.Runtime.getRuntime.totalMemory / (1024 * 1024) -
          java.lang.Runtime.getRuntime.freeMemory / (1024 * 1024)}}""")
      reclaim()
      sec
    }

    // phase A: fresh-session baseline
    force(probe); reclaim() // warm (parquet footers, codegen, JIT)
    val freshTimes = (1 to 3).map(_ => timedPass("fresh"))

    // phase B: age the session with the catalog prefix
    val prefix = graft.SparkEntry.queries.keys.toSeq.sorted
      .takeWhile(_ != probe).take(nPrefix)
    println(s"""{"phase":"aging","n_prefix":${prefix.size}}""")
    val tA = System.nanoTime()
    prefix.foreach { n => force(n); reclaim() }
    println(f"""{"phase":"aged","sec":${(System.nanoTime() - tA) / 1e9}%.1f,""" +
      f""""codecache_mb":${poolUsedMb("CodeHeap")},""" +
      f""""metaspace_mb":${poolUsedMb("Metaspace")}}""")

    // phase C: the probe in the aged session
    val agedTimes = (1 to 3).map(_ => timedPass("aged"))
    println(f"""{"phase":"summary","fresh_min":${freshTimes.min}%.2f,""" +
      f""""aged_min":${agedTimes.min}%.2f,""" +
      f""""inflation":${agedTimes.min / freshTimes.min}%.2f}""")
    spark.stop()
  }
}
