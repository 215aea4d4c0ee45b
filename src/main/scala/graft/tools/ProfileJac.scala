package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Scratch stage profiler for jaccardSimilarityJoin (q41). */
object ProfileJac {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val sn = 3; val threshold = 0.5
      val shingleUdf = udf((t: String) =>
        DedupOps.shingles(if (t == null) "" else t, sn).distinct)
      val sets = docs
        .select(col("doc_id").as("id"), shingleUdf(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("sets")(sets.count())

      val ex = sets.select(col("id"), explode(col("sh")).as("tok"))
        .select(col("id"), xxhash64(col("tok")).as("h"))
      val byH = org.apache.spark.sql.expressions.Window.partitionBy("h")
      val ordered = ex
        .withColumn("df", count(lit(1)).over(byH))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("toks"))
        .select(col("id"),
          expr("transform(toks, x -> x.h)").as("toks"),
          size(col("toks")).as("n"))
      val prefixed = ordered.select(col("id"), col("n"),
        posexplode(slice(col("toks"), lit(1),
          (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int"))))
        .select(col("id"), col("n"), (col("pos") + 1).as("p"), col("col").as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefixed")(prefixed.count())

      val eps = 1e-9
      val cand = prefixed.select(col("id").as("id_a"), col("n").as("na"),
          col("p").as("pa"), col("h"))
        .join(prefixed.select(col("id").as("id_b"), col("n").as("nb"),
          col("p").as("pb"), col("h")), Seq("h"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("na"), col("nb")) >=
          lit(threshold) * greatest(col("na"), col("nb")) - lit(eps))
        .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >=
          lit(threshold / (1 + threshold)) * (col("na") + col("nb")) - lit(eps))
        .select("id_a", "id_b").distinct()
      time("cand")(cand.count())

      val out = cand
        .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_inter"),
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))).cast("long").as("n_union"))
        .filter(col("n_inter") >= lit(threshold) * col("n_union"))
      time("verify")(out.count())
      sets.unpersist(); prefixed.unpersist()
    }
    spark.stop()
  }
}
