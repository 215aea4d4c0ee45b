package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for r16 optimization work (not part of the
  * catalog; deleted before round end). */
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("pagerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))

    what match {
      case "boot" =>
        val ev = graft.core.Tables.normalizeTs(
          graft.core.Tables.load(spark, dir, "events"), "ts")
          .select(col("event_type"), col("event_id"),
            (floor(col("value") * 100 + 0.5)).cast("long").as("cents"))
        for (rep <- 1 to 3) {
          println(s"--- rep $rep")
          t("events-scan")(noop(ev))
          val exploded = ev
            .filter(col("event_id").isNotNull && col("cents").isNotNull)
            .select(col("event_type").as("__g"), col("cents").as("__v"),
              col("event_id").cast("string").as("__id"))
            .withColumn("__b", explode(array((-1 until 16).map(lit(_)): _*)))
          t("explode-only")(noop(exploded))
          val u = graft.operators.SamplingOps.uniformHash(
            concat(col("__id"), lit("#"), col("__b").cast("string")), "boot")
          t("explode+hash")(noop(exploded.withColumn("__u", u)))
          val w = when(col("__b") === -1, lit(1))
            .otherwise(graft.operators.SamplingOps.poissonCdf.foldLeft(lit(0)) {
              (acc, th) => acc + when(u >= th, 1).otherwise(0)
            })
          t("explode+weight")(noop(exploded.withColumn("__w", w)))
          val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
          val grid = exploded.withColumn("__w", w)
            .groupBy("__g", "__b")
            .agg(sum(col("__w").cast(dec)).cast(dec).as("__n"),
              sum((col("__w").cast(dec) * col("__v")).cast(dec)).cast(dec)
                .as("__s"))
          t("grid")(noop(grid))
          // explicit-CSE variant: u materialized once as a column
          val wcse = when(col("__b") === -1, lit(1))
            .otherwise(graft.operators.SamplingOps.poissonCdf.foldLeft(lit(0)) {
              (acc, th) => acc + when(col("__u") >= th, 1).otherwise(0)
            })
          val gridCse = exploded.withColumn("__u", u).withColumn("__w", wcse)
            .groupBy("__g", "__b")
            .agg(sum(col("__w").cast(dec)).cast(dec).as("__n"),
              sum((col("__w").cast(dec) * col("__v")).cast(dec)).cast(dec)
                .as("__s"))
          t("grid-cse")(noop(gridCse))
          // long-sum variant (values identical when no overflow)
          val gridLong = exploded.withColumn("__u", u).withColumn("__w", wcse)
            .groupBy("__g", "__b")
            .agg(sum(col("__w")).as("__n"),
              sum(col("__w").cast("long") * col("__v")).as("__s"))
          t("grid-long")(noop(gridLong))
          t("full-q216")(noop(graft.operators.SamplingOps.bootstrapCi(
            ev, "event_type", "cents", "event_id", b = 16)))
        }
      case "mad" =>
        val in = li.sparkSession.read
          .parquet(s"$dir/lineitem.parquet")
          .select(col("l_linestatus"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("cents"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"))
        for (rep <- 1 to 3) {
          println(s"--- rep $rep")
          t("census-only") {
            val base = in.filter(col("cents").isNotNull)
              .select(col("l_linestatus").as("__g"),
                col("cents").cast("long").as("__v"), col("tie").as("__t"))
            val bg = base.groupBy("__g").agg(count(lit(1)).as("__n"))
              .filter(col("__n") > 100000000L)
            println(s"  bigEmpty=${bg.isEmpty}")
          }
          t("full-q228")(noop(graft.operators.Stats.madByGroup(
            in, "l_linestatus", "cents", "tie")))
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
          spark.catalog.clearCache()
        }
      case "sig" =>
        import graft.operators.DedupOps.{fnv1a64, shingles, splitmix64}
        val docs = graft.core.Tables.load(spark, dir, "documents")
        val oldSig = {
          val n = 64; val sn = 3
          val f = udf { text: String =>
            val sh = shingles(if (text == null) "" else text, sn)
            val sig = Array.fill(n)(Long.MaxValue)
            var i = 0
            while (i < sh.length) {
              val base = fnv1a64(sh(i))
              var j = 0
              while (j < n) {
                val h = splitmix64(base + j * 0x9e3779b97f4a7c15L)
                if (h < sig(j)) sig(j) = h
                j += 1
              }
              i += 1
            }
            sig
          }
          f
        }
        val newSig = graft.operators.DedupOps.minhashSignature(64, 3)
        val fanned = graft.operators.Parallelism.fanOut(
          docs.select(col("doc_id"), col("text")), col("doc_id"))
        for (rep <- 1 to 3) {
          println(s"--- rep $rep")
          t("old-sig")(noop(fanned.select(col("doc_id"),
            oldSig(col("text")).as("sig"))))
          t("new-sig")(noop(fanned.select(col("doc_id"),
            newSig(col("text")).as("sig"))))
        }
        // equality audit
        val mismatch = fanned.select(col("doc_id"),
          oldSig(col("text")).as("a"), newSig(col("text")).as("b"))
          .filter(col("a") =!= col("b")).count()
        println(s"MISMATCH $mismatch")
      case "cc" =>
        val c = graft.core.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"))
        val star = c.filter(col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey").as("id_a"),
            (col("c_custkey") - col("c_custkey") % 5).as("id_b"))
        val chain = c.filter(col("c_custkey") % 50 < 8)
          .select(col("c_custkey").as("id_a"), (col("c_custkey") + 1).as("id_b"))
        val pairs = star.unionByName(chain)
        // variant A: no stepped checkpoint (r15 shape)
        def ccA(p: DataFrame): DataFrame = {
          val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
          val edges = p
            .select(col("id_a").cast("long").as("src"),
              col("id_b").cast("long").as("dst"))
            .union(p.select(col("id_b").cast("long").as("src"),
              col("id_a").cast("long").as("dst")))
            .distinct().persist(lvl)
          var labels = edges.groupBy(col("src").as("id"))
            .agg(least(min(col("dst")), col("src")).as("label"))
            .localCheckpoint(true)
          var iter = 0
          var converged = false
          while (!converged && iter < 50) {
            val neighborMin = edges
              .join(labels.withColumnRenamed("id", "dst2")
                .hint("shuffle_hash"), col("dst") === col("dst2"))
              .groupBy(col("src")).agg(min("label").as("nlabel"))
            val stepped = labels
              .join(neighborMin.hint("shuffle_hash"),
                labels("id") === neighborMin("src"), "left")
              .select(col("id"), col("label"),
                least(col("label"), coalesce(col("nlabel"), col("label")))
                  .as("nl"))
            val jumped = stepped
              .join(stepped.select(col("id").as("jid"), col("nl").as("jl"))
                .hint("shuffle_hash"), col("nl") === col("jid"), "left")
              .select(col("id"), col("label"),
                coalesce(col("jl"), col("nl")).as("newLabel"))
              .localCheckpoint(true)
            converged = jumped.filter(col("newLabel") < col("label")).isEmpty
            labels = jumped.select(col("id"), col("newLabel").as("label"))
            iter += 1
          }
          edges.unpersist()
          labels.select(col("id"), col("label").as("cluster_id"))
        }
        def clear2(): Unit = {
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
          spark.catalog.clearCache()
        }
        for (rep <- 1 to 3) {
          println(s"--- rep $rep")
          t("A-nockpt")(noop(ccA(pairs))); clear2()
          t("B-ckpt")(noop(graft.operators.DedupOps.clusterDuplicates(pairs)))
          clear2()
        }
      case "pagerank" =>
        // replicate pageRankTopK phases
        for (rep <- 1 to 2) {
          println(s"--- rep $rep")
          val edges = graft.operators.GraphOps.coOccurrenceEdges(
            li, "l_orderkey", "l_partkey")
          t("edges-noop")(noop(edges))
          val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
          val e = edges.repartition(n, col("src")).persist()
          t("e-materialize")(noop(e))
          val ndeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
            .select(col("src").as("node"), col("deg")).persist()
          t("ndeg-materialize")(noop(ndeg))
          var ranks = ndeg.withColumn("rank", lit(1000000000L))
            .localCheckpoint()
          t("ranks0-checkpoint")(ranks.count())
          for (i <- 0 until 5) {
            ranks = t(s"iter$i") {
              val contrib = ranks.select(col("node").as("src"),
                expr("rank div deg").as("c"))
              val msgs = e.join(contrib, "src")
                .groupBy("dst").agg(sum("c").as("s"))
              ndeg.join(msgs, ndeg("node") === msgs("dst"), "left")
                .select(col("node"), col("deg"),
                  (lit(150000000L) + expr("17 * coalesce(s, 0L) div 20"))
                    .as("rank"))
                .localCheckpoint()
            }
          }
          t("topk") {
            ranks.select(col("node"), col("rank").as("rank_q"))
              .orderBy(desc("rank_q"), asc("node")).limit(100)
              .queryExecution.toRdd.foreach(_ => ())
          }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
          spark.catalog.clearCache()
        }
      case "cooc" =>
        val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
        def joinPairs = {
          val a = li.select(col("l_orderkey").as("k"),
            col("l_partkey").as("src"))
          val b = li.select(col("l_orderkey").as("k"),
            col("l_partkey").as("dst"))
          a.join(b, "k").filter(col("src") =!= col("dst"))
            .select("src", "dst")
        }
        def listPairs = {
          val g = li.groupBy(col("l_orderkey").as("k"))
            .agg(collect_list(col("l_partkey")).as("items"))
          g.select(explode(col("items")).as("src"), col("items"))
            .select(col("src"), explode(col("items")).as("dst"))
            .filter(col("src") =!= col("dst"))
        }
        for (rep <- 1 to 3) {
          println(s"--- rep $rep")
          t("join-distinct")(noop(joinPairs.distinct()))
          t("join-nodistinct")(noop(joinPairs))
          t("join-repart-dropdup")(noop(
            joinPairs.repartition(n, col("src"))
              .dropDuplicates("src", "dst")))
          t("list-distinct")(noop(listPairs.distinct()))
          t("list-repart-dropdup")(noop(
            listPairs.repartition(n, col("src"))
              .dropDuplicates("src", "dst")))
          // sanity: same row count
          if (rep == 1) {
            val c1 = joinPairs.distinct().count()
            val c2 = listPairs.dropDuplicates("src", "dst").count()
            println(s"COUNTS join=$c1 list=$c2")
          }
        }
      case "hits" =>
        val orders = graft.core.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val ein = orders.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
        val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val dec = "decimal(38,0)"
        val mass = lit(1000000000000L).cast(dec)
        def clear(): Unit = {
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
          spark.catalog.clearCache()
        }
        // variant A: original r15 — single src-partitioned e, distinct +
        // repartition, renorm = crossJoin over UNmaterialized raw,
        // pmod floor division, checkpoint the normalized vector
        def hitsA(): DataFrame = {
          val e = ein.select(col("src"), col("dst")).distinct()
            .repartition(n, col("src")).persist()
          def renorm(raw: DataFrame): DataFrame = {
            val tot = raw.agg(sum("raw").as("__tot"))
            val p = col("raw") * mass
            raw.crossJoin(broadcast(tot))
              .select(col("node"),
                ((p - pmod(p, col("__tot"))) / col("__tot"))
                  .cast(dec).cast("long").as("s"))
              .localCheckpoint()
          }
          var h = e.select(col("src").as("node")).distinct()
            .withColumn("s", lit(1000000L)).localCheckpoint()
          var a: DataFrame = h
          for (_ <- 0 until 3) {
            a = renorm(e.join(h.withColumnRenamed("node", "src"), Seq("src"))
              .groupBy(col("dst").as("node")).agg(sum("s").cast(dec).as("raw")))
            h = renorm(e.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
              .groupBy(col("src").as("node")).agg(sum("s").cast(dec).as("raw")))
          }
          a.select(col("node"), lit("auth").as("side"), col("s").as("score_q"))
            .unionAll(h.select(col("node"), lit("hub").as("side"),
              col("s").as("score_q")))
        }
        // variant B: current r16 code
        def hitsB(): DataFrame = graft.operators.GraphOps.hits(ein, 3)
        // variant C: A + entry fold only (single e, one exchange)
        def hitsC(): DataFrame = {
          val e = ein.select(col("src"), col("dst"))
            .repartition(n, col("src")).dropDuplicates("src", "dst")
            .persist()
          def renorm(raw: DataFrame): DataFrame = {
            val tot = raw.agg(sum("raw").as("__tot"))
            val p = col("raw") * mass
            raw.crossJoin(broadcast(tot))
              .select(col("node"),
                ((p - pmod(p, col("__tot"))) / col("__tot"))
                  .cast(dec).cast("long").as("s"))
              .localCheckpoint()
          }
          var h = e.select(col("src").as("node")).distinct()
            .withColumn("s", lit(1000000L)).localCheckpoint()
          var a: DataFrame = h
          for (_ <- 0 until 3) {
            a = renorm(e.join(h.withColumnRenamed("node", "src"), Seq("src"))
              .groupBy(col("dst").as("node")).agg(sum("s").cast(dec).as("raw")))
            h = renorm(e.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
              .groupBy(col("src").as("node")).agg(sum("s").cast(dec).as("raw")))
          }
          a.select(col("node"), lit("auth").as("side"), col("s").as("score_q"))
            .unionAll(h.select(col("node"), lit("hub").as("side"),
              col("s").as("score_q")))
        }
        // variant D: C + dual orientation (no renorm change)
        def hitsD(): DataFrame = {
          val eSrc = ein.select(col("src"), col("dst"))
            .repartition(n, col("src")).dropDuplicates("src", "dst")
            .persist()
          val eDst = eSrc.repartition(n, col("dst")).persist()
          def renorm(raw: DataFrame): DataFrame = {
            val tot = raw.agg(sum("raw").as("__tot"))
            val p = col("raw") * mass
            raw.crossJoin(broadcast(tot))
              .select(col("node"),
                ((p - pmod(p, col("__tot"))) / col("__tot"))
                  .cast(dec).cast("long").as("s"))
              .localCheckpoint()
          }
          var h = eSrc.select(col("src").as("node")).distinct()
            .withColumn("s", lit(1000000L)).localCheckpoint()
          var a: DataFrame = h
          for (_ <- 0 until 3) {
            a = renorm(eSrc.join(h.withColumnRenamed("node", "src"), Seq("src"))
              .groupBy(col("dst").as("node")).agg(sum("s").cast(dec).as("raw")))
            h = renorm(eDst.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
              .groupBy(col("src").as("node")).agg(sum("s").cast(dec).as("raw")))
          }
          a.select(col("node"), lit("auth").as("side"), col("s").as("score_q"))
            .unionAll(h.select(col("node"), lit("hub").as("side"),
              col("s").as("score_q")))
        }
        for (rep <- 1 to 3) {
          println(s"--- rep $rep")
          t("A-orig")(noop(hitsA())); clear()
          t("C-fold")(noop(hitsC())); clear()
          t("D-dual")(noop(hitsD())); clear()
          t("B-r16")(noop(hitsB())); clear()
        }
    }
    spark.stop()
  }
}
