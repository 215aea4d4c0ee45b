package graft.queries

import graft.SparkSpec
import graft.model.ReferenceRegion
import graft.core.{GenomicDataset, Tables}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the plans we designed for are the plans
  * Catalyst actually produces (".explain and iterate" — the builder
  * brief). Scan pruning/pushdown, broadcast joins for dims, partition
  * pruning on the Hive layout. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val q = graft.SparkEntry.queries(name)
    q(spark, sf).queryExecution.executedPlan.toString
  }

  test("q02 filter+projection reach the parquet scan") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(plan.contains("l_shipdate"), "date filter should be pushed")
    // projection pruning: untouched wide columns are not read
    assert(plan.contains("ReadSchema"))
    assert(!plan.split("ReadSchema").last.contains("l_comment"))
    assert(!plan.split("ReadSchema").last.split("\n").head.contains("l_tax"))
  }

  test("q03 star join broadcasts the dimension tables") {
    val plan = planOf("q03_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("q01 aggregation is partial (map-side) then final") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_"), "expected map-side partial aggregation")
  }

  test("region filter pushes down to parquet") {
    implicit val fe: org.apache.spark.sql.Encoder[graft.model.Feature] =
      Encoders.product
    val path = tmpDir() + "/pf.parquet"
    val feats = (0 until 100).map(i => graft.model.Feature(
      featureId = Some(s"f$i"), referenceName = Some("chr" + (i % 2 + 1)),
      start = Some(i * 10L), end = Some(i * 10L + 5L)))
    GenomicDataset(spark.createDataset(feats),
      graft.model.GenomicMetadata.empty).saveAsParquet(path)
    val loaded = GenomicDataset.loadParquet[graft.model.Feature](spark, path)
      .filterByOverlappingRegion(ReferenceRegion("chr1", 0, 100))
    val plan = loaded.ds.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("referenceName"), "contig equality should push down")
  }

  test("partitioned layout prunes partitions for a region query") {
    implicit val fe: org.apache.spark.sql.Encoder[graft.model.Feature] =
      Encoders.product
    val path = tmpDir() + "/pp.parquet"
    val feats = (0 until 200).map(i => graft.model.Feature(
      featureId = Some(s"f$i"), referenceName = Some("chr" + (i % 2 + 1)),
      start = Some(i * 100L), end = Some(i * 100L + 50L)))
    GenomicDataset(spark.createDataset(feats),
      graft.model.GenomicMetadata.empty)
      .saveAsPartitionedParquet(path, binSize = 1000L)
    val pruned = GenomicDataset.loadPartitionedParquet[graft.model.Feature](
      spark, path, regions = Seq(ReferenceRegion("chr1", 0, 1000)))
    val plan = pruned.ds.queryExecution.executedPlan.toString
    // partition filters appear as PartitionFilters on the scan
    assert(plan.contains("PartitionFilters: ["), plan.take(1200))
    assert(plan.contains("positionBin"), "bin range should prune partitions")
    assert(pruned.ds.count() > 0)
  }

  test("q39 grouped region join avoids cartesian/nested-loop plans") {
    val plan = planOf("q39_region_join_grouped")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("q38 IVF probe join broadcasts the query side") {
    val plan = planOf("q38_ivf_ann")
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("markDuplicates windows shuffle only narrow verdict columns") {
    // the regroup aggregation carries projected fields, not records: the
    // window input must NOT contain the sequence column
    implicit val ae: org.apache.spark.sql.Encoder[graft.model.Alignment] =
      Encoders.product
    val reads = spark.createDataset((0 until 100).map(i =>
      graft.model.Alignment(readName = Some(s"r$i"),
        referenceName = Some("chr1"), start = Some(i.toLong),
        end = Some(i + 36L), cigar = Some("36M"), sequence = Some("A" * 36),
        qualityScores = Some("I" * 36), readMapped = Some(true),
        readPaired = Some(false), readNegativeStrand = Some(false),
        primaryAlignment = Some(true), secondaryAlignment = Some(false),
        supplementaryAlignment = Some(false))))
    val plan = graft.operators.AlignmentOps.markDuplicates(reads)
      .queryExecution.executedPlan.toString
    // tree children print BELOW the parent: everything after the Window
    // line is the bucket-aggregation pipeline feeding it — it must carry
    // projected fragment fields, never the sequence column
    assert(plan.contains("Window"))
    val windowInput = plan.split("Window").last
    assert(!windowInput.contains("sequence#"),
      "window input should be narrow fragment keys, not full records")
  }

  test("q41 similarity join: equi-join candidates, no cartesian, cached index") {
    val plan = planOf("q41_jaccard_join_exact")
    assert(!plan.contains("CartesianProduct"), "prefix join must be an equi join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    // the persisted shingle-set/prefix tables appear as in-memory scans
    assert(plan.contains("InMemoryTableScan"),
      "shared shingle index should be cached, not recomputed per branch")
  }

  test("q28/q30 near-dup self-joins scan the cached signature table, not recompute") {
    // both aliased self-join sides must read the persisted narrow
    // (id, sig)/(id, shingles) table — one signature-UDF pass per doc.
    // Without the persist Catalyst plans zero ReusedExchange for the
    // differently-aliased projections and the dominant UDF runs twice.
    for (q <- Seq("q28_minhash_neardup", "q30_ngram_jaccard",
        "q58_embedding_neardup_lsh")) {
      val plan = planOf(q)
      assert(plan.contains("InMemoryTableScan"),
        s"$q: signature table should be cached, not recomputed per side")
      assert(!plan.contains("CartesianProduct"), plan.take(600))
    }
    spark.catalog.clearCache()
  }

  test("q64 SemDeDup scans the cached assignment table; pair join is equi") {
    val plan = planOf("q64_semantic_dedup")
    // the UDF assignment feeds both pair-join sides and the final
    // projection — must come from the persisted table, not recompute
    assert(plan.contains("InMemoryTableScan"), plan.take(600))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    spark.catalog.clearCache()
  }

  test("q65/q66 index probes add no shuffle to the scoring scan") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val dsirIdx = graft.operators.SamplingOps.dsirIndex(
      docs, "doc_id", "text", col("lang") === "en", buckets = 256)
    val dsirPlan = graft.operators.SamplingOps.dsirScoreAgainst(
      docs, dsirIdx, "text", buckets = 256)
      .queryExecution.executedPlan.toString
    assert(!dsirPlan.contains("Exchange"),
      s"dsir probe must be a narrow scan:\n${dsirPlan.take(600)}")
    val lmIdx = graft.operators.TextOps.lmIndex(
      docs.filter(col("lang") === "en"), "text", buckets = 256)
    val lmPlan = graft.operators.TextOps.lmScoreAgainst(
      docs, lmIdx, "text", buckets = 256)
      .queryExecution.executedPlan.toString
    assert(!lmPlan.contains("Exchange"),
      s"lm probe must be a narrow scan:\n${lmPlan.take(600)}")
  }

  test("q51 incremental dedup broadcasts the batch into the index join") {
    val plan = planOf("q51_minhash_incremental")
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("q60 ExactSubstr plans equi joins with partial aggregation") {
    val plan = planOf("q60_exact_substr_dedup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    // gram stats must pre-aggregate map-side (partial_count / partial_min)
    // so a corpus-hot gram can never pin a single reducer
    assert(plan.contains("partial_count") || plan.contains("partial count") ||
      plan.contains("HashAggregate(keys=[h"), plan.take(1200))
  }

  test("q78 hash split is a pure per-row pass — zero exchanges") {
    val plan = planOf("q78_hash_split")
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"))
  }

  test("q79/q80: benchmark grams and rate tables broadcast; corpus never shuffles strings") {
    val p79 = planOf("q79_decontam_report")
    assert(p79.contains("BroadcastHashJoin"), p79.take(800))
    // corpus-side exchanges carry (doc_id, counts) partials only; the
    // benchmark side may shuffle its own (small) grams for the distinct.
    // A corpus gram shuffle would show an exchange keyed on doc_id whose
    // row still carries the __g string.
    val exchanges79 = p79.linesIterator.filter(_.contains("Exchange")).toList
    assert(!exchanges79.exists(l => l.contains("doc_id") && l.contains("__g")),
      s"corpus gram strings shuffled: $exchanges79")
    val p80 = planOf("q80_temperature_mix")
    assert(p80.contains("BroadcastHashJoin"), p80.take(800))
  }

  test("q81 line dedup: distinct-projection frequency, no cartesian") {
    val plan = planOf("q81_global_line_dedup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // the doc-frequency agg runs over the (line, doc) DISTINCT projection:
    // a distinct HashAggregate keyed on (line, doc_id) must feed the count
    assert(plan.linesIterator.exists(l => l.contains("HashAggregate") &&
      l.contains("line") && l.contains("doc_id") && !l.contains("count")),
      "missing (line, doc) distinct stage")
    assert(plan.contains("partial_count"), "frequency count not map-side combined")
  }

  test("q83 collocations: TakeOrdered top-k, broadcast unigram joins") {
    val plan = planOf("q83_collocations_pmi")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must not be a global sort: " + plan.take(500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q84 PassJoin: equi-join candidates, no cartesian, levenshtein verify") {
    val plan = planOf("q84_edit_distance_neardup")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("levenshtein"), "verify stage missing")
    // candidate pairs dedup before the verify joins
    assert(plan.linesIterator.exists(l => l.contains("HashAggregate") &&
      l.contains("id_a") && l.contains("id_b")),
      "candidate distinct stage missing")
  }

  test("q85/q86: one keyed exchange feeds the window; counts partial-agg") {
    val p85 = planOf("q85_event_transitions")
    assert(p85.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("Broadcast")) == 2, // user window + final count
      p85.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p85.contains("partial_count"))
    val p86 = planOf("q86_value_percentiles")
    // the rank windows and BOTH aggregate stages ride the single
    // event_type exchange — no second shuffle, no buffering percentile agg
    assert(p86.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("Broadcast")) == 1,
      p86.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!p86.contains("percentile"), "must not use a buffering percentile agg")
  }

  test("q91 CMS: map-side token counts, cells broadcast into the probe") {
    val plan = planOf("q91_cms_heavy_hitters")
    assert(plan.contains("partial_count"),
      "token counts must map-side combine: " + plan.take(500))
    assert(plan.contains("BroadcastHashJoin"),
      "the depth x width cell grid should broadcast to the probes")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q92 HLL: one aggregation chain, no plan-reuse recompute") {
    val plan = planOf("q92_hll_distinct")
    // token-count shuffle + register shuffle + final single-row agg
    assert(plan.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("Broadcast")) <= 3,
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(plan.contains("partial_count"))
  }

  test("q94 bottom-k: two-phase sharded top-k, sketch computed once") {
    val plan = planOf("q94_source_overlap_sketch")
    assert(plan.linesIterator.count(_.contains("Window [row_number()")) >= 2,
      "expected shard-phase + group-phase windows:\n" +
        plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    // Spark 4 inserts partial WindowGroupLimit before each rank exchange —
    // the map-side top-k that makes the phases skew-safe
    assert(plan.contains("WindowGroupLimit"),
      "rank-limit pushdown missing")
    // the sketch pipeline is persisted, so the pair stage reads the cache
    // instead of re-running distinct+windows per reference
    assert(plan.contains("InMemoryTableScan"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
    // the pair list is driver-enumerated and the sketch lookup is a hash
    // equi-join on g — the OR-predicate formulation planned a nested loop
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q109/q111 BPE: vocab-keyed aggs, partial counts, no cartesian") {
    Seq("q109_bpe_merges", "q111_bpe_encode").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(500))
      assert(!plan.contains("BroadcastNestedLoopJoin"), q)
    }
    // the encode join aggregates map-side before the word shuffle
    assert(planOf("q111_bpe_encode").contains("partial_count"))
  }

  test("q112 histogram: map-side combined cells; window over bins only") {
    val plan = planOf("q112_value_histogram_percentiles")
    assert(plan.contains("partial_count"),
      "cell counts must map-side combine")
    // the cumulative window partitions by group (never an empty
    // partition spec = single-partition sort)
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("event_type")),
      plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q113 weighted sample: TakeOrdered, not a global sort") {
    val plan = planOf("q113_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q115 CDC chunking: per-doc arrays, partial-agg savings rollup") {
    val plan = planOf("q115_cdc_chunk_dedup")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_count"),
      "chunk counts must map-side combine")
  }

  test("q126 snapshot delta: fingerprint-width full-outer equi join") {
    val plan = planOf("q126_snapshot_delta")
    assert(plan.contains("FullOuter"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q127 budget select: range partitions + broadcast offsets, no global sort of the data") {
    val plan = planOf("q127_token_budget_select")
    // phase 1: the data is RANGE partitioned (parallel local cumsums)...
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"), plan.take(800))
    // ...phase 2 joins back the per-partition offsets via broadcast
    assert(plan.contains("BroadcastHashJoin"),
      "offsets must join back as a broadcast")
    assert(!plan.contains("CartesianProduct"))
    // every window over the DATA is keyed by the range partition id; the
    // only unkeyed window runs over the one-row-per-partition aggregate
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__pid")), plan.take(800))
  }

  test("q128 calibration: windows keyed by stratum only") {
    val plan = planOf("q128_calibrated_quality_select")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("source")),
      plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q129 next-event examples: key-partitioned window, ROWS frame capped") {
    val plan = planOf("q129_next_event_examples")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("user_id")), plan.take(800))
    assert(plan.contains("-3, -1"),
      "history frame must be the bounded ROWS [-3, -1] span: " +
        plan.linesIterator.filter(_.contains("windowspecdefinition"))
          .mkString("\n"))
  }

  test("q130 salted join: salt reaches the join keys, no nested loop") {
    val plan = planOf("q130_salted_skew_join")
    assert(plan.contains("__salt"), plan.take(800))
    assert(plan.contains("Generate") || plan.contains("explode"),
      "dim side must replicate via explode")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q132 global ntile: no window and no second exchange over the data") {
    val plan = planOf("q132_length_deciles")
    // range partitioning feeds the cache; the output path must be cache
    // scan -> broadcast offsets join -> project. A Window.partitionBy(pid)
    // formulation would add a full-data hash Exchange + Sort here.
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // the only windows run over the one-row-per-range-partition aggregate
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__pid")), plan.take(800))
    // local rank comes from monotonically_increasing_id, not row_number
    assert(!plan.contains("row_number"), "rank must not use a data window")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q133 key skew report: map-side combine + TakeOrdered head") {
    // the operator checkpoints its bounded result (tier 1, Caching), so
    // the RETURNED plan is a Scan ExistingRDD — assert on the plan that
    // actually executed inside the materialization
    planOf("q133_key_skew")
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(plan.contains("partial_count"),
      "per-key counts must map-side combine")
    assert(plan.contains("TakeOrdered"),
      "top-k head must be TakeOrdered, never a global sort: " +
        plan.take(600))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "totals must broadcast onto the k result rows")
    }

  test("q134 source novelty: broadcast summary joins, no cartesian") {
    val plan = planOf("q134_source_novelty")
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      "per-source summaries must broadcast, not sort-merge")
  }

  test("q135 source similarity: bounded broadcast pair join, partial agg") {
    val plan = planOf("q135_source_similarity")
    assert(plan.contains("partial_count"),
      "the corpus aggregation must map-side combine")
    assert(plan.contains("BroadcastHashJoin"),
      "pair join on bucket must broadcast the bounded counts table")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q136 chi-square: map-side combine + TakeOrdered top-k") {
    val plan = planOf("q136_chi2_features")
    assert(plan.contains("partial_count"), plan.take(600))
    assert(plan.contains("TakeOrdered"),
      "top-k must be TakeOrdered, never a global sort")
  }

  test("q137 rrf: bounded TakeOrdered rankings, no cartesian") {
    val plan = planOf("q137_rrf_fusion")
    assert(plan.contains("TakeOrdered"),
      "each ranking head must be TakeOrdered: " + plan.take(500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q138 gini: rank windows keyed by source only") {
    val plan = planOf("q138_source_gini")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("source")), plan.take(800))
  }

  test("q139 grouped top-k: WindowGroupLimit pushes the per-group limit") {
    val plan = planOf("q139_top_docs_per_source")
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k must trigger the group-limit pushdown: " + plan.take(600))
  }

  test("q140/q141/q142 single-aggregation reports: map-side combine, no window") {
    for (q <- Seq("q140_k_anonymity", "q141_event_trend",
        "q142_wilson_quality_rank")) {
      val plan = planOf(q)
      assert(plan.contains("partial_count"), s"$q: " + plan.take(400))
      assert(!plan.contains("Window"), s"$q must be window-free")
      assert(!plan.contains("CartesianProduct"), q)
    }
  }

  test("q143 profile: one scan, one Expand-backed aggregation") {
    val plan = planOf("q143_table_profile")
    assert(plan.contains("Expand"), plan.take(500))
    // exactly one parquet scan of documents — not one per column
    assert(plan.split("Scan parquet").length == 2,
      "profile must scan the table once: " + plan.take(600))
  }

  test("q144 fk audit: broadcast key join, projections only") {
    val plan = planOf("q144_fk_audit")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    // only the key columns reach the scan
    assert(!plan.split("ReadSchema").last.contains("o_comment"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q145 pk audit: two-level aggregation, window-free") {
    val plan = planOf("q145_pk_audit")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(!plan.contains("Window"))
  }

  test("q147 rolling actives: contribute-forward rewrite, no per-day rescan") {
    // tier-1 checkpointed result (Caching) — inspect the executed plan
    planOf("q147_rolling_actives")
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(plan.contains("Generate") || plan.contains("explode"),
      "pairs must explode forward to their window ends: " + plan.take(400))
    assert(!plan.contains("Window"), "no window over the data")
    // one events scan feeds both dau and the rolling branch (the branches
    // read the persisted distinct-pair cache, not parquet)
    assert(plan.split("Scan parquet").length <= 3, plan.take(600))
  }

  test("q152 water-fill: every window/agg over the bounded source table") {
    planOf("q152_waterfill_mixture") // checkpoint hides the executed plan
    val plan = graft.operators.Caching.lastMaterializedPlan
    // corpus work is ONE partial-aggregated count (r16: the grid is
    // PERSISTED, so the six decision branches read the cache instead of
    // re-aggregating the corpus — the double-scan detector's first fix);
    // the windows downstream run over per-source rows, so the
    // single-partition Window is fine
    assert(plan.contains("InMemoryTableScan") ||
      plan.contains("partial_"), "grid must be cached or map-side combined")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "totals/cut/remainder must broadcast onto the bounded grid")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q153 balanced shards: two-phase rank, no single-partition data sort") {
    val plan = planOf("q153_balanced_shards")
    // the sort work is a range exchange; the only unkeyed window is the
    // per-partition offsets table (the globalNtile recipe)
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"), plan.take(800))
    assert(plan.contains("partial_"), "report must map-side combine")
  }

  test("q158 assortativity: broadcastable degree joins, partial sums") {
    planOf("q158_assortativity")
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(plan.contains("partial_"), "edge sums must map-side combine")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q162 capped top-k: WindowGroupLimit below, TakeOrdered above") {
    val plan = planOf("q162_capped_topk")
    assert(plan.contains("WindowGroupLimit"),
      "per-group cap must push below the shuffle: " + plan.take(600))
    assert(plan.contains("TakeOrdered"),
      "global k must be TakeOrdered, never a full sort: " + plan.take(600))
  }

  test("q163 MAD outliers: keyed rank windows only, broadcast cut joins") {
    val plan = planOf("q163_mad_outliers")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("event_type")),
      "both disc-median ranks must be keyed by the group")
    assert(plan.contains("BroadcastHashJoin"),
      "median/mad summaries must broadcast back")
  }

  test("q164 percent-rank: two-phase distributed rank, never a " +
      "per-group single-task sort") {
    val plan = planOf("q164_percent_rank_norm")
    // the sort work is a range exchange over (group, score) — fully
    // parallel even when ONE group owns most rows
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"), plan.take(800))
    // the built-in would be a Window partitioned by event_type alone
    // (each ENTIRE group sorted by one task); the only window allowed is
    // the per-partition offsets scan of the globalRank recipe
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__pid")),
      plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert(!plan.contains("percent_rank"),
      "must not fall back to the single-reducer built-in")
    // per-group (min, n) summary broadcasts back
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q168 neyman: map-side-combined moments, no cartesian on data") {
    val plan = planOf("q168_neyman_allocation")
    assert(plan.contains("partial_"),
      "the moment sums must map-side combine: " + plan.take(600))
    assert(!plan.contains("CartesianProduct"),
      "budget/total scalars must broadcast, never cartesian")
  }

  test("q169 exact source overlap: fp equi-join + broadcast grid, " +
      "never an all-pairs product") {
    val plan = planOf("q169_source_overlap_exact")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the ONLY non-equi join is the bounded totals-grid cross (a
    // broadcast nested loop over |sources|-row aggregates); the fp
    // self-join must be an equi hash join (broadcast here at sf0.01,
    // shuffled-on-fp at scale — either way keyed, never a product)
    assert(plan.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") == 1, plan.take(800))
    assert(plan.contains("HashJoin [fp") || plan.contains("[fp#"),
      "fp self-join must be an equi join: " + plan.take(800))
  }

  test("q171 filter waterfall: one scan, one aggregation pass") {
    val plan = planOf("q171_filter_waterfall")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1,
      "3x|rules| sums must share ONE documents scan: " + plan.take(600))
    assert(!plan.contains("Exchange hashpartitioning"),
      "a global agg needs no keyed exchange")
  }

  test("q172 HITS top-k: per-side WindowGroupLimit cut") {
    val plan = planOf("q172_hits_topk")
    assert(plan.contains("WindowGroupLimit"),
      "the per-side cut must push below the shuffle: " + plan.take(600))
  }

  test("q173 RFM: ntile offsets broadcast back, no single-partition " +
      "data sort") {
    val plan = planOf("q173_rfm_scores")
    assert(plan.contains("BroadcastHashJoin"),
      "per-partition rank offsets must broadcast: " + plan.take(600))
    // the only unkeyed window sorts run over per-partition summary rows
    // (the two-phase globalRank shape); the data-volume exchanges are
    // the range partitionings of the three ntile passes
    assert(plan.contains("rangepartitioning"), plan.take(600))
  }

  test("q148 volume anomalies: keyed trailing frame only") {
    val plan = planOf("q148_volume_anomalies")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("event_type")), plan.take(800))
    assert(plan.contains("-7, -1"),
      "trailing frame must be ROWS [-7,-1]: " +
        plan.linesIterator.filter(_.contains("windowspecdefinition"))
          .mkString("\n"))
  }

  test("q149 retention: keyed aggregations only, no data-wide window") {
    val plan = planOf("q149_retention_cohorts")
    assert(!plan.contains("Window"), "cohorts come from groupBy, not windows")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(plan.contains("partial_count"),
      "triangle count must map-side combine: " + plan.take(600))
  }

  test("q150 calendar fill: forward-fill window is keyed by the group") {
    val plan = planOf("q150_calendar_fill")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("event_type")),
      "fill window must partition by event_type: " + plan.take(800))
  }

  test("q151 ab test: one aggregation pass, no window, no nested loop") {
    val plan = planOf("q151_ab_test")
    assert(!plan.contains("Window"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(plan.contains("partial_"), "unit rollup must map-side combine")
  }

  test("q131 boilerplate: map-side combined doc-frequency, no all-pairs") {
    val plan = planOf("q131_boilerplate_removal")
    assert(plan.contains("partial_count"),
      "paragraph doc-frequency must map-side combine")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q103 k-core: no window sort — histogram median + keyed peel rounds") {
    val plan = planOf("q103_kcore")
    assert(!plan.contains("Window"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q96/q100 perceptual dedup: banded equi-join, popcount verify, no all-pairs") {
    Seq("q96_image_neardup", "q100_audio_neardup").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), q + ": " + plan.take(500))
      assert(!plan.contains("BroadcastNestedLoopJoin"), q)
      assert(plan.contains("bit_count"), q + ": popcount verify missing")
      // candidate pairs are distinct'd before the verify joins
      assert(plan.linesIterator.exists(l => l.contains("HashAggregate") &&
        l.contains("id_a") && l.contains("id_b")), q)
    }
  }

  test("q98 triangles: oriented wedge join closes as equi joins only") {
    val plan = planOf("q98_triangle_counts")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_count"),
      "per-node triangle counts must map-side combine")
  }

  test("q99 association rules: basket-keyed pair join, partial-agg supports") {
    val plan = planOf("q99_association_rules")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("partial_count"))
  }

  test("q97 PCA projection: one label exchange after the bounded collect") {
    val plan = planOf("q97_pca_label_separation")
    assert(plan.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("Broadcast")) <= 2,
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(plan.contains("partial_"),
      "label stats must partial-aggregate before the shuffle")
  }

  test("q118 NB: broadcast model join, partial counts, bounded crosses") {
    planOf("q118_nb_language_confusion") // checkpoint hides the plan
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"),
      "model-scoring join must broadcast the labels x buckets model")
    assert(plan.contains("partial_count"),
      "token/doc counts must map-side combine")
    // the only nested-loop joins are the broadcast crosses against the
    // per-label constant table (rows = label count) — never a data-sized
    // side
    assert(plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .forall(_.contains("Cross")), plan.take(800))
  }

  test("q119 LPA: equi joins only, map-side label counts") {
    val plan = planOf("q119_copurchase_communities")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_count"),
      "neighbor-label counts must map-side combine")
    assert(plan.contains("TakeOrdered"),
      "community top-k must be a TakeOrdered, not a global sort")
  }

  test("binned interval join plans as an equi join, not a cartesian") {
    val l = Tables.load(spark, sf, "part").select(
      (col("p_partkey") % 4).cast("string").as("referenceName"),
      (col("p_partkey") * 13 % 10000).as("start"),
      (col("p_partkey") * 13 % 10000 + 10).as("end"), col("p_partkey").as("id"))
    val plan = graft.operators.RegionJoins
      .overlapJoin(l, l, "inner", binSize = 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "must not be a cross join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "must not be a nested-loop join")
    assert(plan.contains("Join"), plan.take(400))
  }

  test("catalog interval joins run on the TUNED bin width (auto-tune " +
      "exercised through the oracle gate) and keep join-shaped plans") {
    // the catalog's synthetic intervals are short (p95 length < floor), so
    // tunedBinSize must resolve to exactly the floor — same plan as the
    // previous literal constants, proving the flip is output-invariant
    val li = Tables.load(spark, sf, "lineitem")
    val reads = li.select(
      (col("l_orderkey") % 4).cast("string").as("referenceName"),
      ((col("l_partkey") * 7 + col("l_linenumber")) % 10000).as("start"),
      (((col("l_partkey") * 7 + col("l_linenumber")) % 10000) + 1 +
        (col("l_suppkey") % 50)).as("end"))
    val feats = Tables.load(spark, sf, "part").select(
      (col("p_partkey") % 4).cast("string").as("referenceName"),
      ((col("p_partkey") * 13) % 10000).as("start"),
      (((col("p_partkey") * 13) % 10000) + 1 + (col("p_size") % 80))
        .as("end"))
    assert(graft.operators.RegionJoins.tunedBinSize(reads, feats,
      floor = 100) == 100L)
    for (q <- Seq("q16_region_join_inner", "q17_region_join_outer_counts",
        "q18_region_join_flanked", "q33_region_aggregate")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q: " + plan.take(400))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q: " + plan.take(400))
    }
  }

  test("q184 KS drift: map-side grid collapse feeds the bounded-table " +
      "windows — the value grid aggregates BEFORE any window") {
    // r15: ksFromCounts persists the grid and checkpoints its 1-row
    // result (tier 1), so read the executed PRE-checkpoint plan
    planOf("q184_ks_value_drift")
    val plan = graft.operators.Caching.lastMaterializedPlan
    // the unkeyed running-sum window must consume the CACHED aggregated
    // grid, not data rows: the window's input is an InMemoryTableScan
    val w = plan.indexOf("Window")
    val g = plan.indexOf("InMemoryTableScan")
    assert(w >= 0 && g >= 0 && w < g,
      "window must sit on the persisted aggregated grid: " +
        plan.take(800))
  }

  test("q185 mutual information: marginals re-aggregate from the " +
      "PERSISTED cell grid — one corpus scan, broadcast-only joins") {
    planOf("q185_mutual_information") // runs; checkpoint hides the plan
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(!plan.contains("SortMergeJoin"),
      "bounded marginal joins must broadcast: " + plan.take(800))
    // every corpus read goes through the persisted grid: each printed
    // "Scan parquet" is the INSIDE of an InMemoryRelation (the cache's
    // own build plan), never a direct re-scan
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    val cached = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(scans > 0 && scans == cached,
      s"$scans parquet scans vs $cached cache reads — a direct corpus " +
        "re-scan escaped the grid cache: " + plan.take(800))
  }

  test("q186 kappa: one corpus pass per aggregate family, bounded " +
      "marginal join broadcasts") {
    val plan = planOf("q186_label_agreement")
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("q187 benford: ONE map-side-combined aggregation, no join, no " +
      "window, no UDF digit extraction") {
    val plan = planOf("q187_benford")
    assert(plan.contains("partial_sum"), plan.take(600))
    assert(!plan.contains("Join"), "benford is a single agg: " +
      plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "leading digit must be a codegen'd substring")
  }

  test("q188 silhouette: broadcast-variable classify — no join at all, " +
      "two corpus passes only") {
    val plan = planOf("q188_silhouette")
    assert(!plan.contains("Join"),
      "centroids travel as a broadcast variable, never a join: " +
        plan.take(600))
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("q189 cusum: every window is keyed — no unkeyed sort anywhere") {
    val plan = planOf("q189_cusum_volume_shift")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("key")),
      "cusum windows must partition by key: " + plan.take(800))
    assert(plan.contains("partial_count"),
      "bucket counts must map-side combine: " + plan.take(600))
  }

  test("q190 AUC: two-phase range rank, offsets-only windows, " +
      "broadcast group summaries — never a per-group sort") {
    val plan = planOf("q190_quality_auc")
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"), plan.take(800))
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__pid")),
      "only the globalRank offsets window is allowed: " +
        plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"),
      "per-group rank offsets must broadcast back")
  }

  test("q191 flesch: pure per-row projection — no exchange, no join, " +
      "no window, no UDF") {
    val plan = planOf("q191_readability")
    assert(!plan.contains("Exchange"), "readability must not shuffle: " +
      plan.take(600))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(400))
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "counts must be native regexp expressions")
  }

  test("q192 autocorrelation: grid self-join is keyed, no window, " +
      "map-side bucket counts") {
    val plan = planOf("q192_volume_autocorr")
    assert(!plan.contains("Window"), plan.take(400))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "calendar lag must be an equi join: " + plan.take(600))
    assert(plan.contains("partial_count"),
      "bucket counts must map-side combine")
  }

  test("q193 personalized PageRank: top-k is TakeOrdered over the " +
      "checkpointed ranks, never a full sort") {
    val plan = planOf("q193_seeded_pagerank")
    assert(plan.contains("TakeOrdered"), plan.take(600))
  }

  test("q194 hapax: one map-side-combined term shuffle, keyed profile " +
      "agg, no window") {
    val plan = planOf("q194_lexical_richness")
    assert(plan.contains("partial_count"), plan.take(600))
    assert(!plan.contains("Window") && !plan.contains("Join"),
      plan.take(400))
  }

  test("q196 ranked eval: discount and IDCG tables broadcast, counts " +
      "map-side combine, the only window is the per-source ranking") {
    val plan = planOf("q196_ranked_eval")
    assert(plan.contains("BroadcastHashJoin"),
      "discount/IDCG literal tables must broadcast: " + plan.take(600))
    assert(!plan.contains("SortMergeJoin"), plan.take(600))
    assert(plan.contains("partial_"),
      "per-query metrics must map-side combine")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("source")),
      "only the catalog's own per-source row_number window is allowed: " +
        plan.take(800))
  }

  test("q197 target encode: global prior re-aggregates from the " +
      "PERSISTED category grid and broadcasts — one corpus scan") {
    val plan = planOf("q197_target_encode")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    val cached = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(scans > 0 && scans == cached,
      s"$scans parquet scans vs $cached cache reads — a direct corpus " +
        "re-scan escaped the grid cache: " + plan.take(800))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the 1-row global must broadcast onto the category grid")
  }

  test("q198 json profile: native parse (no UDF), map-side key census, " +
      "broadcast totals") {
    val plan = planOf("q198_json_key_profile")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "from_json must be the native expression: " + plan.take(400))
    assert(plan.contains("partial_"),
      "per-key census must map-side combine")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the 1-row totals must broadcast onto the key rows")
    assert(!plan.contains("Window"), plan.take(400))
  }

  test("q199 moments: ONE map-side-combined aggregation, no join, no " +
      "window") {
    val plan = planOf("q199_price_moments")
    assert(plan.contains("partial_sum"), plan.take(600))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "moments is a single agg: " + plan.take(400))
  }

  test("q200 robust scale: keyed rank windows only, cut rows broadcast " +
      "back") {
    val plan = planOf("q200_robust_scale")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("event_type")),
      "percentile ranks must be keyed by the group: " + plan.take(800))
    assert(plan.contains("BroadcastHashJoin"),
      "per-group cuts must broadcast back")
  }

  test("q201 skip-gram: position-explode fanout joins as a keyed equi " +
      "join — never a per-document cartesian") {
    val plan = planOf("q201_skipgram_pairs")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pair generation must be (doc, position) equi: " + plan.take(600))
    assert(plan.contains("Generate"),
      "context positions come from an explode")
    assert(plan.contains("partial_count"),
      "pair counts must map-side combine")
  }

  test("q202 join probe: count tables join, the data rows never do — " +
      "no window, broadcast summaries") {
    val plan = planOf("q202_join_size_probe")
    assert(plan.contains("partial_count"),
      "per-side key counts must map-side combine: " + plan.take(600))
    assert(!plan.contains("Window"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the 1-row side summaries must broadcast")
  }

  test("q203 transition latency: ONE keyed timeline window feeds " +
      "transition-keyed rank windows") {
    val plan = planOf("q203_transition_latency")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(l => l.contains("__k") || l.contains("transition")),
      "windows must key on the user timeline or the transition: " +
        plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("q206 numeric profile: ONE aggregation pass, the explode runs " +
      "on the single result row — no join, no window") {
    val plan = planOf("q206_numeric_profile")
    assert(plan.contains("partial_"), plan.take(600))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "profile is a single agg + explode: " + plan.take(400))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      "one corpus scan")
  }

  test("q207 column drift: codegen'd fnv buckets (no UDF), grid-keyed " +
      "windows only, map-side counts") {
    val plan = planOf("q207_column_drift")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "fnv1a64 must be the codegen'd expression: " + plan.take(400))
    assert(plan.contains("partial_count"),
      "bucket counts must map-side combine")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("col_name")),
      "totals windows must key on the bounded grid's column name: " +
        plan.take(800))
  }

  test("q208 vocab coverage: distributed rank over the type table — " +
      "range exchange, offsets-only windows") {
    val plan = planOf("q208_vocab_coverage")
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"),
      "type ranking must be the two-phase range rank: " + plan.take(800))
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__pid")),
      "only the globalRank offsets window is allowed: " + plan.take(800))
    assert(plan.contains("partial_count"),
      "term counts must map-side combine")
  }

  test("q195 entropy: grid totals via a group-keyed window, no join, " +
      "no unkeyed sort") {
    val plan = planOf("q195_user_entropy")
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__g")),
      "entropy totals window must partition by the group: " +
        plan.take(800))
    assert(!plan.contains("Join"), plan.take(400))
    assert(plan.contains("partial_count"),
      "(group, value) counts must map-side combine")
  }

  test("q209 tstv: ONE map-side-combined aggregation, per-row codegen " +
      "classification — no join, no window, no UDF") {
    val plan = planOf("q209_tstv_ratio")
    assert(plan.contains("partial_sum"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window") &&
      !plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan.take(600))
  }

  test("q210 HWE: ONE keyed aggregation, the chi-square chain is pure " +
      "projection over it") {
    val plan = planOf("q210_hardy_weinberg")
    assert(plan.contains("partial_sum"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(600))
  }

  test("q211 concordance: one keyed shuffle join, bounded-grid count " +
      "map-side combines") {
    val plan = planOf("q211_genotype_concordance")
    assert(plan.contains("Join"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(plan.contains("partial_count"),
      "grid count must map-side combine: " + plan.take(600))
  }

  test("q212 AF spectrum: per-row integer binning + ONE bounded-grid " +
      "count — no join, no window") {
    val plan = planOf("q212_af_spectrum")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(600))
  }

  test("q213 coverage uniformity: bounded per-contig means BROADCAST " +
      "back — no window over the data, no shuffle join") {
    val plan = planOf("q213_coverage_uniformity")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      plan.take(600))
  }

  test("q214 mendelian: per-row boolean logic + ONE bounded-grid " +
      "count — no join, no window") {
    val plan = planOf("q214_mendelian_grid")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(600))
  }

  test("q215 fleiss: everything re-aggregates from the (item, label) " +
      "grid; only broadcast joins") {
    planOf("q215_fleiss_kappa") // runs; checkpoint hides the plan
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    // the q185 recipe: every corpus read goes through the persisted grid
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    val cached = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(scans > 0 && scans == cached,
      s"$scans parquet scans vs $cached cache reads — a direct corpus " +
        "re-scan escaped the grid cache: " + plan.take(800))
  }

  test("q216 bootstrap: the replicate explode collapses into a " +
      "map-side-combined (group, b) grid; windows keyed by group") {
    val plan = planOf("q216_bootstrap_ci")
    assert(plan.contains("partial_sum"),
      "the grid agg must map-side combine: " + plan.take(600))
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__g")),
      "percentile selection windows must be keyed: " + plan.take(800))
  }

  test("q217 seasonal: grid-keyed windows only, grand total is a " +
      "broadcast 1-row aggregate") {
    val plan = planOf("q217_seasonal_profile")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(l => l.contains("__k") || l.contains("dow")),
      "windows must be keyed by key or slot: " + plan.take(800))
  }

  test("q218 kinship: keyed site self-join (never cartesian), pair " +
      "census map-side combines, no window") {
    planOf("q218_king_kinship") // checkpoint hides the executed plan
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(plan.contains("Join"), plan.take(400))
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      plan.take(800))
    assert(plan.contains("partial_count"),
      "pair census must map-side combine: " + plan.take(600))
  }

  test("q219 inbreeding: keyed site aggregation joins back keyed, " +
      "no window, final chain pure projection") {
    val plan = planOf("q219_inbreeding_f")
    assert(plan.contains("Join"), plan.take(400))
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      plan.take(800))
    assert(plan.contains("partial_sum"), plan.take(600))
  }

  test("q220 substitution: bounded-grid count + broadcast total — " +
      "no window, no shuffle join") {
    val plan = planOf("q220_substitution_matrix")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      plan.take(600))
  }

  test("q221 indel spectrum: per-row classification + ONE bounded-grid " +
      "count — no join, no window") {
    val plan = planOf("q221_indel_spectrum")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(600))
  }

  test("q222 call rate: (sample, class) grid map-side combines, pivot " +
      "re-aggregates the grid — no join, no window") {
    val plan = planOf("q222_call_rate")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(600))
  }

  test("q223 conformal: both sides re-read their PERSISTED score " +
      "grids, no shuffle join, windows only over the bounded grid") {
    planOf("q223_conformal_coverage") // checkpoint hides the plan
    val plan = graft.operators.Caching.lastMaterializedPlan
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("InMemoryTableScan"),
      "score grids must come from the persisted cache: " + plan.take(800))
  }

  test("q224 confident learning: per-class thresholds BROADCAST back, " +
      "bounded-grid census map-side combines — no shuffle join, " +
      "no window") {
    val plan = planOf("q224_confident_learning")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      plan.take(600))
    assert(plan.contains("partial_count"), plan.take(600))
  }

  test("q225 calibration bins: bounded-grid census map-side combines, " +
      "ECE total broadcasts — no shuffle join, no window") {
    val plan = planOf("q225_calibration_bins")
    assert(plan.contains("partial_count"), plan.take(400))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      plan.take(600))
  }

  test("q226 trimmed mean: adaptive rank routing — no dominant group " +
      "at this SF, so the plan IS the plain keyed window (no union, no " +
      "join, no checkpoint); escalation pinned by Round15bOpsSpec + " +
      "ScaleProbe") {
    val plan = planOf("q226_trimmed_mean")
    assert(!plan.contains("Join") && !plan.contains("Union"),
      plan.take(600))
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__g")),
      "rank windows must be keyed by group: " + plan.take(800))
  }

  test("q227 atkinson: ONE map-side-combined aggregation, the index " +
      "chain is pure projection — no join, no window, no log") {
    val plan = planOf("q227_atkinson_index")
    assert(plan.contains("partial_count") ||
      plan.contains("partial_sum"), plan.take(400))
    assert(!plan.contains("Join") && !plan.contains("Window") &&
      !plan.toLowerCase.contains("log("), plan.take(600))
  }

  test("q228 median/MAD: adaptive rank routing — no dominant group at " +
      "this SF, so both ranks are plain keyed windows (no union), the " +
      "median joins back keyed — never a global sort or cartesian") {
    val plan = planOf("q228_median_mad")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Union"),
      plan.take(600))
    assert(plan.contains("Join"), "median must join back: " + plan.take(600))
    assert(plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .forall(_.contains("__g")),
      "rank windows must be keyed by group: " + plan.take(800))
  }
}
