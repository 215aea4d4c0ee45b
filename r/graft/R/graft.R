# SparkR bindings for the graft Spark analytics engine.
#
# Design: unlike the reference's S4 dataset-class hierarchy (adam-r
# bdgenomics.adam/R/ds.R), graft's engine is DataFrame-centric, so the R
# surface is FLAT — every function takes/returns SparkR SparkDataFrames and
# dispatches one static call to the JVM facade `graft.api.JavaApi` (the same
# facade the Python wrapper drives over py4j). Deployment: put the graft jar
# on the Spark classpath (sparkConfig = list(spark.jars = "...")), then
#   library(graft); df <- graft.loadAlignments("reads.bam")
#
# Integer-typed JVM params are passed with as.integer(); Spark's R backend
# widens Integer -> Long where the JVM signature needs it, so every numeric
# default below stays inside 2^31. The (method, arity) surface this file
# calls is pinned against JavaApi by RSurfaceSpec — rename there, fail here.

.jvm <- "graft.api.JavaApi"

.gdf <- function(jdf) {
  new("SparkDataFrame", sdf = jdf, isCached = FALSE)
}

.session <- function() {
  SparkR::sparkR.session()
}

# ------------------------------- loaders ------------------------------------

#' Load alignments from SAM/BAM/CRAM/parquet into a SparkDataFrame.
graft.loadAlignments <- function(path) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "loadAlignments", .session(), path))
}

#' Load features from BED/GFF3/GTF/NarrowPeak/IntervalList/parquet.
graft.loadFeatures <- function(path) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "loadFeatures", .session(), path))
}

#' Load variants from VCF (.vcf/.vcf.gz) or parquet.
graft.loadVariants <- function(path) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "loadVariants", .session(), path))
}

#' Load genotypes from VCF (.vcf/.vcf.gz) or parquet.
graft.loadGenotypes <- function(path) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "loadGenotypes", .session(), path))
}

#' Read WARC web archives (one row per record).
graft.readWarc <- function(pathGlob) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "readWarc", .session(), pathGlob))
}

# --------------------------- read operators ---------------------------------

#' Mark PCR/optical duplicate reads.
graft.markDuplicates <- function(alignments) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "markDuplicates", alignments@sdf))
}

#' samtools-flagstat style summary counts.
graft.flagStat <- function(alignments) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "flagStat", alignments@sdf))
}

#' Count canonical k-mers over aligned read sequences.
graft.countKmers <- function(alignments, k) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "countKmers", alignments@sdf,
                                  as.integer(k)))
}

#' Per-base coverage from alignments.
graft.toCoverage <- function(alignments) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "toCoverage", alignments@sdf))
}

#' Merge equal-depth adjacent coverage runs.
graft.collapseCoverage <- function(coverage) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "collapseCoverage", coverage@sdf))
}

# ---------------------------- interval joins --------------------------------

#' Interval-overlap join; joinType one of inner/left/right/full.
graft.regionJoin <- function(left, right, joinType = "inner") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "regionJoin", left@sdf, right@sdf,
                                  joinType))
}

#' Overlap join broadcasting the (small) right side.
graft.broadcastRegionJoin <- function(left, right, joinType = "inner") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "broadcastRegionJoin", left@sdf,
                                  right@sdf, joinType))
}

#' Per-left-row count of overlapping right rows.
graft.overlapCounts <- function(left, right) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "overlapCounts", left@sdf, right@sdf))
}

# ------------------------------ dedup family --------------------------------

#' Exact duplicate groups by content digest.
graft.exactDuplicates <- function(docs, idCol = "doc_id", textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "exactDuplicates", docs@sdf, idCol,
                                  textCol))
}

#' Drop exact duplicates, keeping one representative per digest.
graft.dropExactDuplicates <- function(docs, idCol = "doc_id",
                                      textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "dropExactDuplicates", docs@sdf,
                                  idCol, textCol))
}

#' MinHash-LSH near-duplicate pairs (id_a, id_b, est_jaccard).
graft.minhashNearDuplicates <- function(docs, idCol = "doc_id",
                                        textCol = "text", numHashes = 128,
                                        shingleN = 3, bands = 32,
                                        threshold = 0.8) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "minhashNearDuplicates", docs@sdf,
                                  idCol, textCol, as.integer(numHashes),
                                  as.integer(shingleN), as.integer(bands),
                                  threshold))
}

#' SimHash near-duplicate pairs by banded Hamming distance.
graft.simhashNearDuplicates <- function(docs, idCol = "doc_id",
                                        textCol = "text", maxDist = 3) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "simhashNearDuplicates", docs@sdf,
                                  idCol, textCol, as.integer(maxDist)))
}

#' Exact all-pairs Jaccard join (PPJoin prefix filter).
graft.jaccardSimilarityJoin <- function(docs, idCol = "doc_id",
                                        textCol = "text", shingleN = 3,
                                        threshold = 0.8) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "jaccardSimilarityJoin", docs@sdf,
                                  idCol, textCol, as.integer(shingleN),
                                  threshold))
}

#' Connected-component cluster ids over near-dup pairs.
graft.clusterDuplicates <- function(pairs) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "clusterDuplicates", pairs@sdf))
}

#' End-to-end near-dedup: cluster pairs, keep one representative per cluster.
graft.applyNearDedup <- function(docs, idCol, pairs) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "applyNearDedup", docs@sdf, idCol,
                                  pairs@sdf))
}

#' Near-dedup apply keeping each cluster's best row by (score desc, id).
graft.applyNearDedupBy <- function(docs, idCol, pairs, scoreCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "applyNearDedupBy", docs@sdf, idCol,
                                  pairs@sdf, scoreCol))
}

#' Edit-distance near-duplicates (PassJoin segment blocking).
graft.editDistanceNearDuplicates <- function(docs, idCol, textCol,
                                             maxDist = 2) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "editDistanceNearDuplicates",
                                  docs@sdf, idCol, textCol,
                                  as.integer(maxDist)))
}

#' Content-defined chunking: boundaries follow content, not offsets.
graft.contentDefinedChunks <- function(docs, idCol = "doc_id",
                                       textCol = "text", window = 8,
                                       maskBits = 6) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "contentDefinedChunks", docs@sdf,
                                  idCol, textCol, as.integer(window),
                                  as.integer(maskBits)))
}

#' One-row chunk-store dedup savings estimate.
graft.chunkDedupReport <- function(chunks) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "chunkDedupReport", chunks@sdf))
}

#' Cross-document boilerplate line removal.
graft.globalLineDedup <- function(docs, idCol, textCol, minDocs = 3) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "globalLineDedup", docs@sdf, idCol,
                                  textCol, as.integer(minDocs)))
}

# ------------------------- similarity / embeddings --------------------------

#' Brute-force exact cosine top-k neighbours.
graft.bruteForceTopK <- function(queries, corpus, k = 10) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "bruteForceTopK", queries@sdf,
                                  corpus@sdf, as.integer(k)))
}

#' Embedding cosine near-duplicate pairs (exact or SRP-banded).
graft.cosineNearDuplicates <- function(corpus, threshold = 0.95,
                                       useLsh = TRUE, numBits = 256) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "cosineNearDuplicates", corpus@sdf,
                                  threshold, useLsh, as.integer(numBits)))
}

# ------------------------------ text quality --------------------------------

#' Gopher-style quality rule columns.
graft.gopherQualityRules <- function(docs, textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "gopherQualityRules", docs@sdf,
                                  textCol))
}

#' Heuristic n-gram language id column.
graft.langId <- function(docs, textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "langId", docs@sdf, textCol))
}

#' Regex PII redaction (emails, phones, ips).
graft.redactPii <- function(docs, textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "redactPii", docs@sdf, textCol))
}

#' Top-k corpus token frequencies.
graft.tokenFrequencies <- function(docs, textCol = "text", k = 100) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "tokenFrequencies", docs@sdf,
                                  textCol, as.integer(k)))
}

#' Deterministic hash-based train/val/test split column.
graft.hashSplit <- function(docs, keyCol, names, fractions, salt = "") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hashSplit", docs@sdf, keyCol,
                                  as.list(names), as.list(fractions), salt))
}

# -------------------------------- sketches ----------------------------------

#' Count-min heavy hitters with exact counts alongside.
graft.cmsHeavyHitters <- function(docs, textCol = "text", depth = 4,
                                  width = 1024, topK = 20) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "cmsHeavyHitters", docs@sdf, textCol,
                                  as.integer(depth), as.integer(width),
                                  as.integer(topK)))
}

#' One-row integer-exact HyperLogLog distinct-count summary.
graft.hllSummary <- function(docs, textCol = "text", p = 10) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hllSummary", docs@sdf, textCol,
                                  as.integer(p)))
}

#' Per-group bottom-k set sketches of word shingles.
graft.bottomKSketch <- function(docs, groupCol, textCol = "text",
                                shingleN = 3, k = 256) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "bottomKSketch", docs@sdf, groupCol,
                                  textCol, as.integer(shingleN),
                                  as.integer(k)))
}

#' Pairwise Jaccard-overlap estimates from bottom-k sketches.
graft.sketchOverlap <- function(sketches, k = 256) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "sketchOverlap", sketches@sdf,
                                  as.integer(k)))
}

#' Per-group equi-width histogram sketch (group, bin, n).
graft.histogramSketch <- function(df, groupCol, valueCol, loCents = 0,
                                  hiCents = 50000, bins = 50) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "histogramSketch", df@sdf, groupCol,
                                  valueCol, as.integer(loCents),
                                  as.integer(hiCents), as.integer(bins)))
}

# ------------------------------ graph analytics -----------------------------

#' Co-occurrence edges from an (order, item) incidence list.
graft.coOccurrenceEdges <- function(incidence, keyCol, itemCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "coOccurrenceEdges", incidence@sdf,
                                  keyCol, itemCol))
}

#' Fixed-point integer PageRank (deterministic at any cluster size).
graft.pageRank <- function(edges, iters = 5, scale = 1000000000) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "pageRank", edges@sdf,
                                  as.integer(iters), as.integer(scale)))
}

#' Per-node triangle counts + clustering coefficient (integer rational).
graft.triangleCounts <- function(edges) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "triangleCounts", edges@sdf))
}

#' Deterministic label-propagation communities: (node, lbl).
graft.labelPropagation <- function(edges, rounds = 4) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "labelPropagation", edges@sdf,
                                  as.integer(rounds)))
}

#' The k largest label-propagation communities: (community, n_nodes).
graft.labelPropagationCommunities <- function(edges, rounds = 4, k = 50) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "labelPropagationCommunities",
                                  edges@sdf, as.integer(rounds),
                                  as.integer(k)))
}

#' Multinomial NB model over hashed token buckets.
graft.nbTrain <- function(docs, labelCol, textCol = "text",
                          buckets = 4096L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "nbTrain", docs@sdf, labelCol,
                                  textCol, as.integer(buckets)))
}

#' Classify against a graft.nbTrain model: (id, pred_label, score_q).
graft.nbClassify <- function(docs, model, idCol = "doc_id",
                             textCol = "text", buckets = 4096L,
                             alpha = 1.0) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "nbClassify", docs@sdf, model@sdf,
                                  idCol, textCol, as.integer(buckets),
                                  as.numeric(alpha)))
}

#' NB train/classify confusion matrix: (true_label, pred_label, n_docs).
graft.nbConfusion <- function(train, test, idCol = "doc_id",
                              labelCol = "lang", textCol = "text",
                              buckets = 4096L, alpha = 1.0) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "nbConfusion", train@sdf,
                                  test@sdf, idCol, labelCol, textCol,
                                  as.integer(buckets), as.numeric(alpha)))
}

#' SCD2 validity intervals: point-in-time-correct feature versions.
graft.scd2Intervals <- function(events, keyCol, attrCol, tsCol = "ts",
                                tieBreak = "event_id") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "scd2Intervals", events@sdf,
                                  keyCol, attrCol, tsCol, tieBreak))
}

#' Positional-index phrase search: (id, n_occurrences).
graft.phraseSearch <- function(docs, phrase, idCol = "doc_id",
                               textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "phraseSearch", docs@sdf, idCol,
                                  textCol, as.list(as.character(phrase))))
}

#' Stateless NB scoring against a batch-trained model (streaming or batch).
graft.streamingNbRoute <- function(docs, model, textCol = "text",
                                   buckets = 4096L, alpha = 1.0) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "streamingNbRoute", docs@sdf,
                                  model@sdf, textCol, as.integer(buckets),
                                  as.numeric(alpha)))
}

#' Dedup-aware split: no near-duplicate pair crosses a split boundary.
graft.leakSafeSplit <- function(docs, idCol, pairs, names, fractions,
                                salt = "graft") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "leakSafeSplit", docs@sdf, idCol,
                                  pairs@sdf, as.list(as.character(names)),
                                  as.list(as.numeric(fractions)), salt))
}

#' Hard-negative mining: per anchor, top-k similar rows with another label.
graft.hardNegativesTopK <- function(anchors, corpus, k = 5L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hardNegativesTopK", anchors@sdf,
                                  corpus@sdf, as.integer(k)))
}

#' MMR diversified top-k: (rank, id, rel, score) in selection order.
graft.mmrSelect <- function(corpus, queryVec, k = 10L, lambda = 0.7,
                            nCandidates = 200L, idCol = "id",
                            vecCol = "vec") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "mmrSelect", corpus@sdf,
                                  as.list(as.numeric(queryVec)),
                                  as.integer(k), as.numeric(lambda),
                                  as.integer(nCandidates), idCol, vecCol))
}

#' k-core peel at the data-derived median degree.
graft.kCore <- function(edges, rounds = 4) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "kCoreByMedianDegree", edges@sdf,
                                  as.integer(rounds)))
}

#' Market-basket association rules with integer-exact metrics.
graft.associationRules <- function(incidence, keyCol, itemCol,
                                   minPairSupport = 2,
                                   maxBasketSize = 10000) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "associationRules", incidence@sdf,
                                  keyCol, itemCol,
                                  as.integer(minPairSupport),
                                  as.integer(maxBasketSize)))
}

#' BPE tokenizer training: learned merge table over the word histogram.
graft.bpeMerges <- function(docs, textCol = "text", numMerges = 10) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "bpeMerges", docs@sdf, textCol,
                                  as.integer(numMerges)))
}

#' Post-training subword statistics: top-k vocabulary tokens.
graft.bpeTokenStats <- function(docs, textCol = "text", numMerges = 10,
                                topK = 40) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "bpeTokenStats", docs@sdf, textCol,
                                  as.integer(numMerges), as.integer(topK)))
}

#' Encode the corpus with a trained BPE tokenizer: per-doc token counts.
graft.bpeEncodeCounts <- function(docs, idCol = "doc_id", textCol = "text",
                                  numMerges = 10) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "bpeEncodeCounts", docs@sdf, idCol,
                                  textCol, as.integer(numMerges)))
}

# --------------------------- structural variants ----------------------------

#' Link VCF breakend (BND) records to mates by MATEID or coordinates.
graft.linkBreakends <- function(variants) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "linkBreakends", variants@sdf))
}

#' Group structural-variant records by INFO EVENT.
graft.breakendEventGroups <- function(variants) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "breakendEventGroups", variants@sdf))
}

# ------------------------------- multimodal ---------------------------------

#' Perceptual image hash table via real BMP decode.
graft.imageDHash <- function(media) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "imageDHash", media@sdf))
}

#' Image near-duplicate pairs by banded Hamming over dHash.
graft.imageNearDuplicates <- function(media, maxDist = 3, bands = 4) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "imageNearDuplicates", media@sdf,
                                  as.integer(maxDist), as.integer(bands)))
}

#' Audio near-duplicate pairs over the energy fingerprint.
graft.audioNearDuplicates <- function(media, maxDist = 3, bands = 4) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "audioNearDuplicates", media@sdf,
                                  as.integer(maxDist), as.integer(bands)))
}

#' Video near-duplicate pairs by keyframe dHash through the AVI codec.
graft.videoNearDuplicates <- function(media, maxDist = 3, bands = 4) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "videoNearDuplicates", media@sdf,
                                  as.integer(maxDist), as.integer(bands)))
}

#' Pocket batch-perceptron over quantized-long features (deterministic).
graft.perceptronTrain <- function(feats, featureCols, labelCol = "y",
                                  iters = 24) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "perceptronTrain", feats@sdf,
                                  as.list(featureCols), labelCol,
                                  as.integer(iters)))
}

#' Weighted sampling without replacement: k rows, p proportional to weight.
graft.weightedSample <- function(df, keyCol, weightCol, k, salt = "graft") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "weightedSample", df@sdf, keyCol,
                                  weightCol, as.integer(k), salt))
}

#' Per-group k-sigma outlier counts via the exact integer z-test.
graft.zScoreOutliers <- function(df, groupCol, valueCol, kPermille = 3000) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "zScoreOutliers", df@sdf, groupCol,
                                  valueCol, as.integer(kPermille)))
}

# -------------------------------- statistics --------------------------------

#' Exact Pearson correlation matrix (bit-identical across engines).
graft.correlationMatrix <- function(df, cols, quantScale = 1000000) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "correlationMatrix", df@sdf,
                                  as.list(cols), as.integer(quantScale)))
}

# --------------------------- corpus maintenance -----------------------------

#' Incremental corpus diff between two snapshots (added/deleted/changed/
#' unchanged via constant-width fingerprints).
graft.snapshotDelta <- function(old, new, idCol = "doc_id",
                                textCol = "text", carryCols = list()) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "snapshotDelta", old@sdf, new@sdf,
                                  idCol, textCol, as.list(carryCols)))
}

#' Snapshot delta rolled up per group.
graft.snapshotDeltaReport <- function(delta, groupCols) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "snapshotDeltaReport", delta@sdf,
                                  as.list(groupCols)))
}

#' Token-budget selection: best-scored prefix under a global token budget.
graft.budgetSelect <- function(docs, idCol, scoreCol, tokensCol, budget) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "budgetSelect", docs@sdf, idCol,
                                  scoreCol, tokensCol,
                                  SparkR::sparkR.callJStatic(
                                    "java.lang.Long", "valueOf",
                                    format(budget, scientific = FALSE))))
}

#' Per-stratum percentile calibration + top-fraction selection.
graft.calibratedSelect <- function(docs, strataCol, idCol, scoreCol,
                                   keepFraction = 0.3) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "calibratedSelect", docs@sdf,
                                  strataCol, idCol, scoreCol,
                                  as.numeric(keepFraction)))
}

#' Bounded-history next-event training examples.
graft.nextEventExamples <- function(events, keyCol = "user_id",
                                    typeCol = "event_type", tsCol = "ts",
                                    tieBreak = "event_id", historyLen = 3) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "nextEventExamples", events@sdf,
                                  keyCol, typeCol, tsCol, tieBreak,
                                  as.integer(historyLen)))
}

#' Explicit salted skew join (result equals the plain equi-join).
graft.saltedJoin <- function(left, right, usingKeys, saltKeyCol, salts = 8,
                             joinType = "inner") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "saltedJoin", left@sdf, right@sdf,
                                  as.list(usingKeys), saltKeyCol,
                                  as.integer(salts), joinType))
}

#' Exact global equal-depth binning (ANSI NTILE semantics, parallel sort).
graft.globalNtile <- function(df, valueCol, tieBreak, n) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "globalNtile", df@sdf, valueCol,
                                  tieBreak, as.integer(n)))
}

#' Key-skew profile: top-k heaviest keys with share and global totals.
graft.keySkewReport <- function(df, keyCol, k = 20) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "keySkewReport", df@sdf, keyCol,
                                  as.integer(k)))
}

#' Per-source novelty attribution after exact dedup.
graft.sourceNovelty <- function(docs, textCol = "text",
                                sourceCol = "source") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "sourceNovelty", docs@sdf,
                                  textCol, sourceCol))
}

#' Pairwise source cosine over hashed unigram count vectors.
graft.sourceSimilarity <- function(docs, textCol = "text",
                                   sourceCol = "source", buckets = 4096) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "sourceSimilarity", docs@sdf,
                                  textCol, sourceCol, as.integer(buckets)))
}

#' Top-k label-discriminative token buckets by exact quantized chi-square.
graft.chiSquareFeatures <- function(docs, labelCol = "source",
                                    textCol = "text", buckets = 4096,
                                    k = 50) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "chiSquareFeatures", docs@sdf,
                                  labelCol, textCol, as.integer(buckets),
                                  as.integer(k)))
}

#' Reciprocal-rank fusion of two (id, rank) rankings (integer-exact).
graft.rrfFuse <- function(a, b, idCol = "doc_id", rankCol = "rank",
                          k = 60, topN = 100) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "rrfFuse", a@sdf, b@sdf, idCol,
                                  rankCol, as.integer(k), as.integer(topN)))
}

#' Per-group Gini concentration of a long value column.
graft.giniByGroup <- function(df, groupCol, valueCol, tieBreak) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "giniByGroup", df@sdf, groupCol,
                                  valueCol, tieBreak))
}

#' k-anonymity release audit over quasi-identifier columns.
graft.kAnonymityReport <- function(df, quasiCols, k = 10) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "kAnonymityReport", df@sdf,
                                  as.list(quasiCols),
                                  SparkR::sparkR.callJStatic(
                                    "java.lang.Long", "valueOf",
                                    format(k, scientific = FALSE))))
}

#' Per-group exact least-squares trend (slope/intercept).
graft.trendByGroup <- function(df, groupCol, xCol, yCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "trendByGroup", df@sdf, groupCol,
                                  xCol, yCol))
}

#' Per-group Wilson score lower bound on a boolean pass rate.
graft.wilsonRanking <- function(df, groupCol, passCol, z = 1.96) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "wilsonRanking", df@sdf, groupCol,
                                  passCol, as.numeric(z)))
}

#' Single-pass table profile (completeness/cardinality/blankness).
graft.profileColumns <- function(df, cols) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "profileColumns", df@sdf,
                                  as.list(cols)))
}

#' Referential-integrity audit (orphan child keys).
graft.fkAudit <- function(child, parent, childKey, parentKey) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "fkAudit", child@sdf, parent@sdf,
                                  childKey, parentKey))
}

#' Primary-key uniqueness audit.
graft.pkAudit <- function(df, keyCols) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "pkAudit", df@sdf,
                                  as.list(keyCols)))
}

#' Reliability diagram over exact equal-depth score buckets.
graft.calibrationCurve <- function(df, scoreCol, outcomeCol, tieBreak,
                                   n = 10) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "calibrationCurve", df@sdf,
                                  scoreCol, outcomeCol, tieBreak,
                                  as.integer(n)))
}

#' Daily + rolling exact distinct actives (DAU/WAU).
graft.rollingDistinctActives <- function(events, keyCol = "user_id",
                                         tsCol = "ts", windowDays = 7) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "rollingDistinctActives",
                                  events@sdf, keyCol, tsCol,
                                  as.integer(windowDays)))
}

#' Trailing-window exact z-test anomaly flags over per-group daily counts.
graft.volumeAnomalies <- function(daily, groupCol, dayCol, countCol,
                                  lookback = 7, minHistory = 4,
                                  kPermille = 3000) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "volumeAnomalies", daily@sdf,
                                  groupCol, dayCol, countCol,
                                  as.integer(lookback),
                                  .jlong(minHistory), .jlong(kPermille)))
}

#' Retention triangle: (cohort_day, age_days, n_active).
graft.retentionCohorts <- function(events, keyCol = "user_id",
                                   tsCol = "ts") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "retentionCohorts", events@sdf,
                                  keyCol, tsCol))
}

#' Calendar gap fill + forward fill on a keyed daily series.
graft.calendarFill <- function(daily, groupCol, dayCol, valueCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "calendarFill", daily@sdf,
                                  groupCol, dayCol, valueCol))
}

#' Pooled two-proportion A/B z-test per experiment group.
graft.abTestReport <- function(units, groupCol, variantCol, outcomeCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "abTestReport", units@sdf,
                                  groupCol, variantCol, outcomeCol))
}

#' Domain-scoped boilerplate removal with per-doc accounting.
graft.removeBoilerplate <- function(docs, idCol = "doc_id",
                                    textCol = "text", groupCol = "source",
                                    minDocs = 3) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "removeBoilerplate", docs@sdf,
                                  idCol, textCol, groupCol,
                                  as.integer(minDocs)))
}

#' Budget-constrained water-filling mixture allocation.
graft.waterFillAllocation <- function(counts, sourceCol, availCol,
                                      weightCol, budget) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "waterFillAllocation", counts@sdf,
                                  sourceCol, availCol, weightCol,
                                  .jlong(budget)))
}

#' Deterministic size-balanced serpentine shard assignment.
graft.balancedShards <- function(df, sizeCol, tieBreak, nShards) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "balancedShards", df@sdf,
                                  sizeCol, tieBreak, as.integer(nShards)))
}

#' Per-shard balance report: (shard, n_items, total_size).
graft.shardReport <- function(df, sizeCol, tieBreak, nShards) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "shardReport", df@sdf,
                                  sizeCol, tieBreak, as.integer(nShards)))
}

#' Newman modularity of a labeled partition: (m, n_within, q_modularity).
graft.modularity <- function(edges, labels) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "modularity", edges@sdf,
                                  labels@sdf))
}

#' Per-group inter-arrival gap profile: (group, n, p50, p90, p99).
graft.interArrivalStats <- function(events, keyCol = "user_id",
                                    tsCol = "ts", idCol = "event_id",
                                    groupCol = "event_type") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "interArrivalStats", events@sdf,
                                  keyCol, tsCol, idCol, groupCol))
}

#' Winsorization audit: exact disc p1/p99 cuts + integer clamp accounting.
graft.winsorizeReport <- function(df, groupCol, valueCol, tieBreak) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "winsorizeReport", df@sdf,
                                  groupCol, valueCol, tieBreak))
}

#' Dyadic recency-weighted trailing mean over keyed daily series.
graft.dyadicTrailingMean <- function(daily, groupCol, dayCol, valueCol,
                                     window = 8) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "dyadicTrailingMean", daily@sdf,
                                  groupCol, dayCol, valueCol,
                                  as.integer(window)))
}

#' Degree assortativity over (src, dst) edges: (m, r_assortativity).
graft.assortativity <- function(edges) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "assortativity", edges@sdf))
}

#' First-touch attribution within a trailing ms window.
graft.firstTouchAttribution <- function(events, keyCol = "user_id",
                                        typeCol = "event_type",
                                        tsCol = "ts", idCol = "event_id",
                                        touchType = "view",
                                        convType = "purchase",
                                        windowMs = 86400000) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "firstTouchAttribution",
                                  events@sdf, keyCol, typeCol, tsCol,
                                  idCol, touchType, convType,
                                  .jlong(windowMs)))
}

#' Incremental cluster merge: existing labels + new duplicate pairs.
graft.mergeClusters <- function(labels, newPairs) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "mergeClusters", labels@sdf,
                                  newPairs@sdf))
}

#' PSI drift report: (b, n_ref, n_cur, psi_q); total = sum(psi_q)/1e7.
graft.psiReport <- function(df, sideCol, bucketCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "psiReport", df@sdf, sideCol,
                                  bucketCol))
}

#' PSI from pre-aggregated (b, n_ref) x (b, n_cur) count tables.
graft.psiFromCounts <- function(ref, cur) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "psiFromCounts", ref@sdf,
                                  cur@sdf))
}

#' Global top-k under a per-group cap (diversity-quota selection).
graft.cappedTopK <- function(df, scoreCol, groupCol, tieBreak, k,
                             perGroupCap) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "cappedTopK", df@sdf, scoreCol,
                                  groupCol, tieBreak, as.integer(k),
                                  as.integer(perGroupCap)))
}

#' MAD robust outlier flags: input columns + (med, mad, is_out).
graft.madOutliers <- function(df, groupCol, valueCol, tieBreak,
                              kPermille = 3500) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "madOutliers", df@sdf, groupCol,
                                  valueCol, tieBreak, .jlong(kPermille)))
}

#' Per-group percent-rank score normalization: input columns + pct_rank.
graft.percentRankNormalize <- function(df, groupCol, scoreCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "percentRankNormalize", df@sdf,
                                  groupCol, scoreCol))
}

#' Horizon (recrawl) dedup by key: input columns + (fresh, epoch).
graft.horizonDedup <- function(df, keyCol, tsCol, tieBreak, horizonMs) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "horizonDedup", df@sdf, keyCol,
                                  tsCol, tieBreak, .jlong(horizonMs)))
}

#' Deterministic fixed-size per-group sample (md5-rank selection).
graft.hashSampleN <- function(df, groupCol, idCol, n) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hashSampleN", df@sdf, groupCol,
                                  idCol, as.integer(n)))
}

#' Neyman optimal stratified-sampling allocation:
#' (stratum, n_rows, weight_q, alloc).
graft.neymanAllocation <- function(df, stratumCol, valueCol, budget) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "neymanAllocation", df@sdf,
                                  stratumCol, valueCol, .jlong(budget)))
}

#' Exact pairwise cross-source duplication matrix.
graft.sourceOverlapExact <- function(docs, textCol, sourceCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "sourceOverlapExact", docs@sdf,
                                  textCol, sourceCol))
}

#' Occurrence-weighted OOV rate per source against a vocabulary frame.
graft.oovRate <- function(docs, textCol, sourceCol, vocab, vocabCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "oovRate", docs@sdf, textCol,
                                  sourceCol, vocab@sdf, vocabCol))
}

#' Integer HITS hub/authority scores over directed edges (src, dst).
graft.hits <- function(edges, iters = 3L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hits", edges@sdf,
                                  as.integer(iters)))
}

#' Top-k hubs and authorities of graft.hits.
graft.hitsTopK <- function(edges, iters, k) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hitsTopK", edges@sdf,
                                  as.integer(iters), as.integer(k)))
}

#' RFM (recency/frequency/monetary) tier scoring per key.
graft.rfmScores <- function(events, keyCol, tsCol, valueCol, tiers = 5L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "rfmScores", events@sdf, keyCol,
                                  tsCol, valueCol, as.integer(tiers)))
}

#' Nearest-centroid label confusion over an embedding table.
graft.nearestCentroidEval <- function(corpus, labelCol,
                                      vecCol = "embedding") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "nearestCentroidEval", corpus@sdf,
                                  labelCol, vecCol))
}

#' Fixed-bucket burst-activity (bot-likelihood) report.
graft.burstActivityReport <- function(events, keyCol, tsCol, bucketMs,
                                      burstThreshold) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "burstActivityReport", events@sdf,
                                  keyCol, tsCol, .jlong(bucketMs),
                                  .jlong(burstThreshold)))
}

#' Functional-dependency violation audit (top-k multi-valued determinants).
graft.fdViolations <- function(df, detCol, depCol, k = 20L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "fdViolations", df@sdf, detCol,
                                  depCol, as.integer(k)))
}

#' Top-k consecutive event-type trigram paths.
graft.eventPathTrigrams <- function(events, keyCol, typeCol, tsCol,
                                    tieBreak, k = 20L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "eventPathTrigrams", events@sdf,
                                  keyCol, typeCol, tsCol, tieBreak,
                                  as.integer(k)))
}

#' Per-group embedding-centroid drift vs the global centroid.
graft.sourceCentroidDrift <- function(corpus, groupCol,
                                      vecCol = "embedding") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "sourceCentroidDrift", corpus@sdf,
                                  groupCol, vecCol))
}

#' Corpus growth curve (new vs re-seen fingerprints per epoch).
graft.corpusGrowthCurve <- function(docs, textCol = "text",
                                    dayCol = "day") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "corpusGrowthCurve", docs@sdf,
                                  textCol, dayCol))
}

#' Domain-level link graph from an HTML column.
graft.linkDomainEdges <- function(docs, srcDomainCol, htmlCol,
                                  idCol = "doc_id") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "linkDomainEdges", docs@sdf,
                                  srcDomainCol, htmlCol, idCol))
}

#' The k most-linked destination domains of a link graph.
graft.topLinkedDomains <- function(edges, k = 10L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "topLinkedDomains", edges@sdf,
                                  as.integer(k)))
}

#' Rendezvous-shard resize audit (keys moved on n -> m reshard).
graft.rendezvousMoveReport <- function(df, keyCol, fromShards, toShards) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "rendezvousMoveReport", df@sdf,
                                  keyCol, as.integer(fromShards),
                                  as.integer(toShards)))
}

#' Two-sample KS drift statistic (reference = side FALSE).
graft.ksDrift <- function(df, sideCol, valueCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "ksDrift", df@sdf, sideCol,
                                  valueCol))
}

#' Mutual information / NMI between two categorical columns.
graft.mutualInformationReport <- function(df, colA, colB) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "mutualInformationReport",
                                  df@sdf, colA, colB))
}

#' Cohen's kappa inter-rater agreement between two label columns.
graft.cohenKappa <- function(df, colA, colB) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "cohenKappa", df@sdf, colA, colB))
}

#' Benford first-digit audit per group.
graft.benfordAudit <- function(df, groupCol, valueCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "benfordAudit", df@sdf, groupCol,
                                  valueCol))
}

#' Simplified (centroid) silhouette per label.
graft.simplifiedSilhouette <- function(corpus, labelCol = "label",
                                       vec = "embedding") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "simplifiedSilhouette",
                                  corpus@sdf, labelCol, vec))
}

#' CUSUM level-shift changepoint per key over bucketed volumes.
graft.cusumChangepoint <- function(events, keyCol, tsCol = "ts",
                                   bucketMs = 86400000) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "cusumChangepoint", events@sdf,
                                  keyCol, tsCol, .jlong(bucketMs)))
}

#' Per-group ROC AUC with exact midrank ties.
graft.aucByGroup <- function(df, groupCol, scoreCol, labelCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "aucByGroup", df@sdf, groupCol,
                                  scoreCol, labelCol))
}

#' Shannon entropy of the value distribution within each group.
graft.entropyByGroup <- function(df, groupCol, valueCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "entropyByGroup", df@sdf,
                                  groupCol, valueCol))
}

#' Flesch reading-ease per document.
graft.fleschReadability <- function(docs, idCol = "doc_id",
                                    textCol = "text") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "fleschReadability", docs@sdf,
                                  idCol, textCol))
}

#' Lag-k autocorrelation of bucketed volumes per key.
graft.autocorrByKey <- function(events, keyCol, tsCol = "ts",
                                bucketMs = 86400000, lagK = 7L) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "autocorrByKey", events@sdf,
                                  keyCol, tsCol, .jlong(bucketMs),
                                  as.integer(lagK)))
}

#' Personalized PageRank from a seed node set.
graft.personalizedPageRank <- function(edges, seeds, iters = 5L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "personalizedPageRank",
                                  edges@sdf, seeds@sdf,
                                  as.integer(iters)))
}

#' Lexical-richness profile (tokens/types/hapax/TTR) per source.
graft.hapaxStats <- function(docs, textCol = "text",
                             sourceCol = "source") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hapaxStats", docs@sdf, textCol,
                                  sourceCol))
}

#' Ranked-retrieval eval per query (P@k, MRR, NDCG@k).
graft.rankedEval <- function(df, queryCol, rankCol, relCol, k = 10L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "rankedEval", df@sdf, queryCol,
                                  rankCol, relCol, as.integer(k)))
}

#' Smoothed target encoding of a categorical column.
graft.targetEncode <- function(df, catCol, valueCol, priorWeight = 20) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "targetEncode", df@sdf, catCol,
                                  valueCol, .jlong(priorWeight)))
}

#' JSON key discovery (presence / cardinality / type census) per key.
graft.jsonKeyProfile <- function(df, jsonCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "jsonKeyProfile", df@sdf,
                                  jsonCol))
}

#' Distribution-shape census (mean/variance/skew/kurtosis) per group.
graft.momentsByGroup <- function(df, groupCol, valueCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "momentsByGroup", df@sdf,
                                  groupCol, valueCol))
}

#' Robust (median/IQR) scaling within each group.
graft.robustScale <- function(df, groupCol, valueCol, tieBreak) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "robustScale", df@sdf, groupCol,
                                  valueCol, tieBreak))
}

#' Skip-gram co-occurrence counts (center, context, n_pairs).
graft.skipGramPairs <- function(docs, idCol = "doc_id",
                                textCol = "text", window = 2L,
                                minCount = 5) {
  .jlong <- function(x) SparkR::sparkR.callJStatic(
    "java.lang.Long", "valueOf", format(x, scientific = FALSE))
  .gdf(SparkR::sparkR.callJStatic(.jvm, "skipGramPairs", docs@sdf,
                                  idCol, textCol, as.integer(window),
                                  .jlong(minCount)))
}

#' Exact pre-join cardinality probe (join_rows, worst-key fanout).
graft.joinSizeProbe <- function(a, keyA, b, keyB) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "joinSizeProbe", a@sdf, keyA,
                                  b@sdf, keyB))
}

#' Per-transition (prev->cur) latency percentiles.
graft.transitionLatency <- function(events, keyCol, typeCol,
                                    tsCol = "ts", idCol = "event_id") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "transitionLatency", events@sdf,
                                  keyCol, typeCol, tsCol, idCol))
}

#' Per-source PII risk census.
graft.piiCensus <- function(docs, textCol = "text",
                            sourceCol = "source") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "piiCensus", docs@sdf, textCol,
                                  sourceCol))
}

#' Temporal split leakage audit (order = labels, earliest first).
graft.temporalSplitAudit <- function(df, splitCol, tsCol, order) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "temporalSplitAudit", df@sdf,
                                  splitCol, tsCol,
                                  paste(order, collapse = ",")))
}

#' Single-scan numeric profile of integer columns.
graft.numericProfile <- function(df, cols) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "numericProfile", df@sdf,
                                  paste(cols, collapse = ",")))
}

#' Per-column value-distribution drift (PSI over hash buckets).
graft.columnDrift <- function(a, b, cols, buckets = 64L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "columnDrift", a@sdf, b@sdf,
                                  paste(cols, collapse = ","),
                                  as.integer(buckets)))
}

#' Vocabulary coverage curve at ascending k values.
graft.vocabCoverage <- function(docs, textCol = "text",
                                ks = c(1000L, 10000L, 50000L)) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "vocabCoverage", docs@sdf,
                                  textCol, paste(ks, collapse = ",")))
}

#' Transition/transversion census per group (SNVs only).
graft.tstvRatio <- function(variants, groupCol,
                            refCol = "referenceAllele",
                            altCol = "alternateAllele") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "tstvRatio", variants@sdf,
                                  groupCol, refCol, altCol))
}

#' Hardy-Weinberg chi-square per site from 0/1/2 genotype classes.
graft.hardyWeinberg <- function(genotypes, siteCol, gtClassCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "hardyWeinberg", genotypes@sdf,
                                  siteCol, gtClassCol))
}

#' Genotype-concordance confusion grid between two callsets.
graft.genotypeConcordance <- function(a, b, keys, classCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "genotypeConcordance", a@sdf,
                                  b@sdf, paste(keys, collapse = ","),
                                  classCol))
}

#' Allele-frequency spectrum histogram.
graft.alleleFrequencySpectrum <- function(variants, acCol, anCol,
                                          bins = 20L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "alleleFrequencySpectrum",
                                  variants@sdf, acCol, anCol,
                                  as.integer(bins)))
}

#' Coverage-evenness census per contig.
graft.coverageUniformity <- function(coverage) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "coverageUniformity",
                                  coverage@sdf))
}

#' Mendelian-consistency grid over trio genotype classes.
graft.mendelianViolations <- function(trios, fatherCol, motherCol,
                                      childCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "mendelianViolations",
                                  trios@sdf, fatherCol, motherCol,
                                  childCol))
}

#' Fleiss' kappa for N raters per item (one row per rating).
graft.fleissKappa <- function(df, itemCol, labelCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "fleissKappa", df@sdf, itemCol,
                                  labelCol))
}

#' Deterministic Poisson-bootstrap CI of the per-group mean.
graft.bootstrapCi <- function(df, groupCol, valueCol, idCol, b = 32L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "bootstrapCi", df@sdf, groupCol,
                                  valueCol, idCol, as.integer(b)))
}

#' Weekly (dow, hour) seasonality profile per key.
graft.seasonalProfile <- function(df, keyCol, tsCol = "ts") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "seasonalProfile", df@sdf,
                                  keyCol, tsCol))
}

#' Pairwise KING-robust kinship over a bounded cohort.
graft.kingKinship <- function(genotypes, sampleCol, siteCol, gtCol,
                              maxSamples = 1000) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "kingKinship", genotypes@sdf,
                                  sampleCol, siteCol, gtCol,
                                  as.numeric(maxSamples)))
}

#' Per-sample inbreeding coefficient F vs cohort allele frequencies.
graft.inbreedingF <- function(genotypes, sampleCol, siteCol, gtCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "inbreedingF", genotypes@sdf,
                                  sampleCol, siteCol, gtCol))
}

#' 12-class SNV substitution census with permille shares.
graft.substitutionMatrix <- function(variants,
                                     refCol = "referenceAllele",
                                     altCol = "alternateAllele") {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "substitutionMatrix",
                                  variants@sdf, refCol, altCol))
}

#' Indel length spectrum with edge-bin clamping.
graft.indelLengthSpectrum <- function(variants,
                                      refCol = "referenceAllele",
                                      altCol = "alternateAllele",
                                      maxAbsLen = 20L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "indelLengthSpectrum",
                                  variants@sdf, refCol, altCol,
                                  as.integer(maxAbsLen)))
}

#' Per-sample call-rate / genotype-class census.
graft.callRate <- function(genotypes, sampleCol, gtCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "callRate", genotypes@sdf,
                                  sampleCol, gtCol))
}

#' Split-conformal calibration audit (threshold + achieved coverage).
graft.conformalCoverage <- function(cal, evalDf, scoreCol,
                                    alphaPermille = 100L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "conformalCoverage", cal@sdf,
                                  evalDf@sdf, scoreCol,
                                  as.integer(alphaPermille)))
}

#' Confident-learning label-noise census.
graft.confidentLearningGrid <- function(df, givenCol, predCol,
                                        confPermilleCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "confidentLearningGrid", df@sdf,
                                  givenCol, predCol, confPermilleCol))
}

#' ECE/reliability report over stated confidence permille.
graft.calibrationBins <- function(df, confPermilleCol, correctCol,
                                  bins = 10L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "calibrationBins", df@sdf,
                                  confPermilleCol, correctCol,
                                  as.integer(bins)))
}

#' Per-group trimmed mean (permille trim band).
graft.trimmedMeanByGroup <- function(df, groupCol, valueCol, tieBreak,
                                     loPermille = 50L,
                                     hiPermille = 950L) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "trimmedMeanByGroup", df@sdf,
                                  groupCol, valueCol, tieBreak,
                                  as.integer(loPermille),
                                  as.integer(hiPermille)))
}

#' Per-group Atkinson (eps=2) inequality index.
graft.atkinsonIndex <- function(df, groupCol, valueCol) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "atkinsonIndex", df@sdf,
                                  groupCol, valueCol))
}

#' Per-group median and median absolute deviation.
graft.madByGroup <- function(df, groupCol, valueCol, tieBreak) {
  .gdf(SparkR::sparkR.callJStatic(.jvm, "madByGroup", df@sdf, groupCol,
                                  valueCol, tieBreak))
}
