package graft

/** Harness-parity gate (VERDICT r7 next-round #3): run the ENTIRE declared
  * query catalog end-to-end on the smallest driver SF and fail the build if
  * any query throws. Round 7's TIMESTAMP_NTZ breakage crashed six queries at
  * analysis time yet `sbt test` stayed green because no spec executed the
  * catalog the way the driver's Verify does — this spec closes that gap: a
  * query that cannot run on the driver's own testdata can no longer reach
  * the driver unseen.
  *
  * Full execution (toRdd.foreach), not just analysis: runtime failures
  * (codegen, spill, cast overflow) must surface here too. sf0.001 keeps the
  * whole catalog under a couple of minutes in local[4].
  */
class CatalogSelfCheckSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every declared query executes on sf0.001 without throwing") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"driver testdata missing at $sfDir")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val r =
          try {
            // run the declared plan and discard rows — same force as Bench
            fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
            None
          } catch {
            case e: Throwable =>
              Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
          }
        // similarity/dedup operators persist narrow internals for the life
        // of the plan — release between queries, same hygiene as Verify
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        r
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crashed on driver testdata:\n" +
        failures.mkString("\n"))
  }

  test("every query has an oracle, and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without oracles (driver downgrades to rows-only): ${(q -- o).toSeq.sorted}")
  }

  test("README's declared query count matches the catalog (no drift)") {
    // VERDICT r10 #3: the count is effectively generated — this gate
    // fails the build whenever README and the catalog disagree.
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    val text = try readme.mkString finally readme.close()
    val m = """declares \*\*(\d+) queries\*\*""".r.findFirstMatchIn(text)
    assert(m.isDefined, "README.md no longer states the query count")
    val n = SparkEntry.queries.size
    assert(m.get.group(1).toInt == n,
      s"README says ${m.get.group(1)} queries but the catalog has $n — " +
        "update README.md's Verification section")
  }

  test("entry() returns rows on sf0.001") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    assert(SparkEntry.entry(spark).limit(1).count() >= 1)
  }
}
