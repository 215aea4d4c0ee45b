package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import graft.model.Alignment
import graft.operators.{AlignmentOps, CoverageOps, DedupOps, GraphOps,
  RegionJoins, SamplingOps, Sessionize, SimilarityOps, SketchOps, TextOps}

/** Java / Python (py4j) facade — the analog of the reference's
  * adam-apis JavaADAMContext + adam-python ds.py surface
  * (adam-apis/src/main/scala/org/bdgenomics/adam/api/java/
  * JavaADAMContext.scala, adam-python/bdgenomics/adam/ds.py:49).
  *
  * Everything here is a STATIC method taking and returning DataFrames with
  * explicit (non-default, non-Option) arguments, so it is directly callable
  * from Java and from PySpark through the py4j gateway:
  *
  * {{{
  * # PySpark
  * ja = spark._jvm.graft.api.JavaApi
  * reads = DataFrame(ja.loadAlignments(spark._jsparkSession, "in.bam"), spark)
  * deduped = DataFrame(ja.markDuplicates(reads._jdf), spark)
  * }}}
  *
  * The typed Scala API (GenomicDataset, operators) remains the primary
  * surface; this file only removes the Scala-isms from the call boundary.
  */
object JavaApi {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
    Encoders.product[Alignment]

  private def asAlignments(df: DataFrame): Dataset[Alignment] =
    df.as[Alignment]

  // ------------------------------ loaders ---------------------------------

  /** Extension-dispatched alignment load (SAM/BAM/CRAM/parquet). */
  def loadAlignments(spark: SparkSession, path: String): DataFrame =
    graft.tools.Cli.loadAlignments(spark, path).toDF

  def loadFeatures(spark: SparkSession, path: String): DataFrame =
    graft.sources.FeatureIO.readFeatures(spark, path).toDF()

  def loadVariants(spark: SparkSession, path: String): DataFrame =
    graft.sources.VcfIO.readVariants(spark, path).toDF

  def loadGenotypes(spark: SparkSession, path: String): DataFrame =
    graft.sources.VcfIO.readGenotypes(spark, path).toDF

  // --------------------------- read operators -----------------------------

  def markDuplicates(alignments: DataFrame): DataFrame =
    AlignmentOps.markDuplicates(asAlignments(alignments)).toDF()

  def flagStat(alignments: DataFrame): DataFrame =
    AlignmentOps.flagStat(asAlignments(alignments))

  def countKmers(alignments: DataFrame, k: Int): DataFrame =
    AlignmentOps.countKmers(asAlignments(alignments), k)

  def toCoverage(alignments: DataFrame): DataFrame =
    AlignmentOps.toCoverage(asAlignments(alignments)).toDF()

  def collapseCoverage(coverage: DataFrame): DataFrame =
    CoverageOps.collapse(coverage)

  def binQualities(alignments: DataFrame): DataFrame =
    AlignmentOps.binQualities(asAlignments(alignments),
      Seq((0, 20, 10), (20, 30, 25), (30, 60, 37))).toDF()

  // ------------------------------- joins ----------------------------------

  /** Binned interval-overlap join; joinType one of
    * inner/left_outer/right_outer/full_outer. */
  def regionJoin(left: DataFrame, right: DataFrame, joinType: String): DataFrame =
    RegionJoins.overlapJoin(left, right, joinType)

  def regionJoinFlanked(
      left: DataFrame, right: DataFrame, joinType: String, flank: Long): DataFrame =
    RegionJoins.overlapJoin(left, right, joinType,
      RegionJoins.DefaultBinSize, flank)

  def broadcastRegionJoin(
      left: DataFrame, right: DataFrame, joinType: String): DataFrame =
    RegionJoins.overlapJoin(left,
      org.apache.spark.sql.functions.broadcast(right), joinType)

  def overlapCounts(left: DataFrame, right: DataFrame): DataFrame =
    RegionJoins.overlapCounts(left, right)

  // ------------------- training-data pipeline operators -------------------

  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    DedupOps.exactDuplicates(docs, idCol, textCol)

  /** C4-style paragraph-level dedup (keep global first occurrence). */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    DedupOps.dedupParagraphs(docs, idCol, textCol, sep)

  /** Paragraphs occurring more than once across the corpus. */
  def duplicatedParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    DedupOps.duplicatedParagraphs(docs, idCol, textCol, sep)

  /** C4 line-level cleaning: textCol rewritten to surviving lines. */
  def c4CleanLines(docs: DataFrame, textCol: String, minWords: Int): DataFrame =
    docs.withColumn(textCol,
      graft.operators.TextOps.c4CleanLines(docs(textCol), minWords))

  /** Within-doc repeated-line removal (first occurrence wins). */
  def dedupLinesInDoc(docs: DataFrame, textCol: String, sep: String): DataFrame =
    docs.withColumn(textCol,
      graft.operators.TextOps.dedupLinesInDoc(docs(textCol), sep))

  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    DedupOps.dropExactDuplicates(docs, idCol, textCol)

  /** Corpus top-k lowercase token frequencies (vocabulary building). */
  def tokenFrequencies(docs: DataFrame, textCol: String, k: Int): DataFrame =
    graft.operators.TextOps.tokenFrequencies(docs, textCol, k)

  /** Gopher quality-rule panel (Rae et al. 2021 A1.1) + keep flag,
    * appended as columns. */
  def gopherQualityRules(docs: DataFrame, textCol: String): DataFrame = {
    val rules = graft.operators.TextOps.gopherQualityRules(docs(textCol))
    val withRules = rules.foldLeft(docs) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }
    withRules.withColumn("keep",
      graft.operators.TextOps.gopherKeep(docs(textCol)))
  }

  /** ExactSubstr (Lee et al. 2021): merged duplicated-substring spans. */
  def duplicatedSubstringSpans(
      docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame =
    DedupOps.duplicatedSubstringSpans(docs, idCol, textCol, minLen)

  /** ExactSubstr removal — keeps the corpus-wide first occurrence. */
  def removeDuplicatedSubstrings(
      docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame =
    DedupOps.removeDuplicatedSubstrings(docs, idCol, textCol, minLen)

  def minhashNearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int, bands: Int, threshold: Double): DataFrame =
    DedupOps.minhashNearDuplicates(docs, idCol, textCol,
      numHashes, shingleN, bands, threshold)

  def simhashNearDuplicates(
      docs: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame =
    DedupOps.simhashNearDuplicates(docs, idCol, textCol, maxDist)

  def jaccardSimilarityJoin(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    DedupOps.jaccardSimilarityJoin(docs, idCol, textCol, shingleN, threshold)

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    DedupOps.fingerprints(docs, idCol, textCol)

  def exactDuplicatesAgainst(
      incoming: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame =
    DedupOps.exactDuplicatesAgainst(incoming, index, idCol, textCol)

  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int): DataFrame =
    DedupOps.minhashSignatures(docs, idCol, textCol, numHashes, shingleN)

  def minhashNearDuplicatesAgainst(
      incoming: DataFrame, index: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int, bands: Int, threshold: Double): DataFrame =
    DedupOps.minhashNearDuplicatesAgainst(incoming, index, idCol, textCol,
      numHashes, shingleN, bands, threshold)

  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    DedupOps.simhashSignatures(docs, idCol, textCol)

  def simhashNearDuplicatesAgainst(
      incoming: DataFrame, index: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame =
    DedupOps.simhashNearDuplicatesAgainst(incoming, index, idCol, textCol, maxDist)

  def srpSignatures(corpus: DataFrame, numBits: Int): DataFrame =
    SimilarityOps.srpSignatures(corpus, numBits)

  def lshTopKAgainst(
      queries: DataFrame, signedCorpus: DataFrame, k: Int,
      numBits: Int, bands: Int): DataFrame =
    SimilarityOps.lshTopKAgainst(queries, signedCorpus, k, numBits, bands)

  /** Connected components over (id_a, id_b) duplicate pairs. */
  def clusterDuplicates(pairs: DataFrame): DataFrame =
    DedupOps.clusterDuplicates(pairs)

  def semanticDuplicates(
      corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double): DataFrame =
    SimilarityOps.semanticDuplicates(corpus, idCol, vecCol, nClusters, threshold)

  def dsirIndex(
      docs: DataFrame, idCol: String, textCol: String, targetExpr: String,
      buckets: Int): DataFrame =
    SamplingOps.dsirIndex(docs, idCol, textCol,
      org.apache.spark.sql.functions.expr(targetExpr), buckets)

  def dsirScoreAgainst(
      docs: DataFrame, index: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    SamplingOps.dsirScoreAgainst(docs, index, textCol, buckets)

  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String, targetExpr: String,
      k: Int, buckets: Int): DataFrame =
    SamplingOps.dsirWeights(docs, idCol, textCol,
      org.apache.spark.sql.functions.expr(targetExpr), k, buckets)

  def lmIndex(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    TextOps.lmIndex(docs, textCol, buckets)

  def lmScoreAgainst(
      docs: DataFrame, index: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    TextOps.lmScoreAgainst(docs, index, textCol, buckets)

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: java.util.List[String],
      leftTime: String, rightTime: String,
      rightCols: java.util.List[String], rightTieBreak: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    Sessionize.asofJoin(left, right, keys.asScala.toSeq, leftTime, rightTime,
      rightCols.asScala.toSeq, rightTieBreak)
  }

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    SimilarityOps.bruteForceTopK(queries, corpus, k)

  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numBits: Int, bands: Int): DataFrame =
    SimilarityOps.lshTopK(queries, corpus, k, numBits, bands)

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame =
    SimilarityOps.ivfTopK(queries, corpus, k, nCentroids, nProbe)

  def ivfCentroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    SimilarityOps.ivfCentroids(corpus, nCentroids)

  def ivfAssignments(corpus: DataFrame, centroids: DataFrame): DataFrame =
    SimilarityOps.ivfAssignments(corpus, centroids)

  def ivfTopKAgainst(
      queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame =
    SimilarityOps.ivfTopKAgainst(queries, assigned, centroids, k, nProbe)

  def cosineNearDuplicates(
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    SimilarityOps.cosineNearDuplicates(vectors, idCol, vecCol, threshold)

  def qualityFilter(docs: DataFrame, textCol: String, minScore: Double): DataFrame =
    docs.filter(TextOps.qualityScore(
      org.apache.spark.sql.functions.col(textCol)) >= minScore)

  def langId(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("pred_lang",
      TextOps.langId(org.apache.spark.sql.functions.col(textCol)))

  def redactPii(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol,
      TextOps.redactPii(org.apache.spark.sql.functions.col(textCol)))

  def packTokenSpans(
      docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, orderCol: String): DataFrame =
    TextOps.packTokenSpans(docs, idCol, textCol, seqLen, orderCol)

  def extractImageFeatures(media: DataFrame): DataFrame =
    graft.operators.MultimodalOps.extractImageFeatures(media)

  def extractAudioFeatures(
      media: DataFrame, windowSamples: Int, hopSamples: Int): DataFrame =
    graft.operators.MultimodalOps.extractAudioFeatures(
      media, windowSamples, hopSamples)

  /** Integer-exact BMP image stats (real codec; see MultimodalOps). */
  def imageStats(media: DataFrame): DataFrame =
    graft.operators.MultimodalOps.imageStats(media)

  /** Integer-exact WAV audio stats (real codec; see MultimodalOps). */
  def audioStats(media: DataFrame, windowSamples: Int): DataFrame =
    graft.operators.MultimodalOps.audioStats(media, windowSamples)

  /** Integer-exact AVI video stats (real codec; see MultimodalOps). */
  def videoStats(media: DataFrame): DataFrame =
    graft.operators.MultimodalOps.videoStats(media)

  /** Frame sampling: real decode for AVI, stub chunking otherwise. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    graft.operators.MultimodalOps.sampleFrames(media, n)

  /** Deterministic hash-Bernoulli stratified sample: `rates` maps stratum
    * value to keep-rate (java.util.Map for py4j/Java callers). */
  def stratifiedSample(
      docs: DataFrame, strataCol: String, keyCol: String,
      rates: java.util.Map[String, Double], defaultRate: Double): DataFrame = {
    import scala.jdk.CollectionConverters._
    SamplingOps.stratifiedSample(docs, strataCol, keyCol,
      rates.asScala.toMap, defaultRate)
  }

  /** HTML -> text extraction over a column (WebOps.htmlToText). */
  def extractHtmlText(docs: DataFrame, htmlCol: String, outCol: String): DataFrame =
    docs.withColumn(outCol, graft.operators.WebOps.htmlToText(
      org.apache.spark.sql.functions.col(htmlCol)))

  /** Canonical URL column (WebOps.canonicalUrl). */
  def canonicalizeUrls(docs: DataFrame, urlCol: String, outCol: String): DataFrame =
    docs.withColumn(outCol, graft.operators.WebOps.canonicalUrl(
      org.apache.spark.sql.functions.col(urlCol)))

  /** URL-level dedup on the canonical form: (idCol, url, n_dups). */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    graft.operators.WebOps.urlDedup(docs, urlCol, idCol)

  /** Fixed-point Lloyd k-means centroids: (ci, cqvec longs). */
  def kmeansFit(corpus: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String): DataFrame =
    graft.operators.ClusteringOps.kmeansFit(corpus, k, iters, idCol, vecCol)

  /** Nearest-centroid probe against a fitted table: (id, cid). */
  def kmeansAssign(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    graft.operators.ClusteringOps.kmeansAssign(corpus, centroids, idCol, vecCol)

  /** De-quantized (ci, cvec float) view for the IVF/SemDeDup consumers. */
  def kmeansCentroidsAsFloat(centroids: DataFrame): DataFrame =
    graft.operators.ClusteringOps.centroidsAsFloat(centroids)

  /** Deterministic named train/val/test split: `names`/`fractions` are
    * parallel lists (py4j auto-converts Python lists); adds a `split`
    * column. */
  def hashSplit(docs: DataFrame, keyCol: String,
      names: java.util.List[String], fractions: java.util.List[java.lang.Double],
      salt: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    SamplingOps.hashSplit(docs, keyCol,
      names.asScala.toSeq.zip(fractions.asScala.toSeq.map(_.doubleValue)), salt)
  }

  /** Temperature-scaled stratum mixture: keep-rates realize w_s ∝ n_s^alpha
    * over an expected `targetRows` budget. */
  def temperatureMix(docs: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, targetRows: Long, salt: String): DataFrame =
    SamplingOps.temperatureMix(docs, strataCol, keyCol, alpha, targetRows, salt)

  /** Per-doc decontamination report vs a benchmark set:
    * (idCol, n_grams, n_hits, contaminated at maxFraction overlap). */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      ngramN: Int, maxFraction: Double): DataFrame =
    graft.operators.TextOps.contaminationReport(
      corpus, benchmark, idCol, textCol, benchTextCol, ngramN, maxFraction)

  /** Cross-document boilerplate line removal:
    * (idCol, cleaned_text, n_removed). */
  def globalLineDedup(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame =
    graft.operators.TextOps.globalLineDedup(docs, idCol, textCol, minDocs)

  /** Sliding-window character chunking:
    * (idCol, chunk_id, chunk_text, chunk_len). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame =
    graft.operators.TextOps.chunkDocuments(docs, idCol, textCol, size, stride)

  /** Top-k adjacent-bigram collocations by quantized PMI:
    * (w1, w2, c12, pmi_q). */
  def collocationsPmi(docs: DataFrame, textCol: String,
      minCount: Long, k: Int): DataFrame =
    graft.operators.TextOps.collocationsPmi(docs, textCol, minCount, k)

  /** PassJoin edit-distance near-dup pairs: (id_a, id_b, dist). */
  def editDistanceNearDuplicates(docs: DataFrame, idCol: String,
      strCol: String, maxDist: Int): DataFrame =
    graft.operators.DedupOps.editDistanceNearDuplicates(
      docs, idCol, strCol, maxDist)

  /** Per-key Markov transition counts:
    * (from_type, to_type, n_transitions). */
  def eventTransitions(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreak: String): DataFrame =
    graft.operators.Sessionize.eventTransitions(
      events, keyCol, typeCol, tsCol, tieBreak)

  /** Containment (subset) similarity pairs: (id_a, id_b, n_inter, c_a, c_b). */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    DedupOps.containmentJoin(docs, idCol, textCol, shingleN, threshold)

  /** Morton z-value column over numeric dims (bounded stats supplied). */
  def zOrderWrite(df: DataFrame, path: String,
      cols: java.util.List[String], numFiles: Int, bitsPerDim: Int): Unit = {
    import scala.jdk.CollectionConverters._
    graft.operators.ZOrder.writeZOrdered(df, path, cols.asScala.toSeq,
      numFiles, bitsPerDim)
  }

  /** Exact grouped disc percentiles via distributed rank:
    * (groupCol, n, p<pct>...). */
  def discPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String, ps: java.util.List[java.lang.Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.Quantiles.discPercentiles(df, groupCol, valueCol,
      tieBreak, ps.asScala.toSeq.map(_.doubleValue))
  }

  /** Count-min heavy hitters: (token, n_exact, n_est, overcount). */
  def cmsHeavyHitters(docs: DataFrame, textCol: String,
      depth: Int, width: Int, topK: Int): DataFrame =
    SketchOps.cmsHeavyHitters(docs, textCol, depth, width, topK)

  /** One-row HyperLogLog distinct-count summary (integer-exact
    * estimator): (n_tokens, n_distinct, v_zero, s_q, est_q, err_permille). */
  def hllSummary(docs: DataFrame, textCol: String, p: Int): DataFrame =
    SketchOps.hllSummary(docs, textCol, p)

  /** Bottom-k shingle-set sketch rows (group, h, r) per group. */
  def bottomKSketch(docs: DataFrame, groupCol: String, textCol: String,
      shingleN: Int, k: Int): DataFrame =
    SketchOps.bottomKSketch(docs, groupCol, textCol, shingleN, k)

  /** Pairwise set-overlap estimates from bottom-k sketches:
    * (grp_a, grp_b, k_used, n_shared, est_jaccard). */
  def sketchOverlap(sketches: DataFrame, k: Int): DataFrame =
    SketchOps.sketchOverlap(sketches, k)

  /** Undirected co-occurrence (market-basket) edges from an
    * (key, item) incidence list. */
  def coOccurrenceEdges(incidence: DataFrame, keyCol: String,
      itemCol: String): DataFrame =
    GraphOps.coOccurrenceEdges(incidence, keyCol, itemCol)

  /** Fixed-point integer PageRank over edges(src, dst): (node, rank_q). */
  def pageRank(edges: DataFrame, iters: Int, scale: Long): DataFrame =
    GraphOps.pageRank(edges, iters, scale)

  /** Top-k PageRank nodes, (rank desc, node asc) tie-break. */
  def pageRankTopK(edges: DataFrame, iters: Int, k: Int,
      scale: Long): DataFrame =
    GraphOps.pageRankTopK(edges, iters, k, scale)

  /** Deterministic label-propagation communities: (node, lbl) after
    * `rounds` synchronous most-frequent-neighbor-label rounds (ties to
    * the smallest label). */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame =
    GraphOps.labelPropagation(edges, rounds)

  /** The k largest [[labelPropagation]] communities:
    * (community, n_nodes), (size desc, community asc) order. */
  def labelPropagationCommunities(edges: DataFrame, rounds: Int,
      k: Int): DataFrame =
    GraphOps.labelPropagationCommunities(edges, rounds, k)

  /** Multinomial NB model over hashed token buckets: (label, b, c) counts
    * plus one b = -1 document-count row per label. */
  def nbTrain(docs: DataFrame, labelCol: String, textCol: String,
      buckets: Int): DataFrame =
    graft.operators.ClassifierOps.nbTrain(docs, labelCol, textCol, buckets)

  /** Classify against an [[nbTrain]] model:
    * (idCol, pred_label, score_q) — integer-quantized log scores,
    * label-ascending ties. */
  def nbClassify(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int, alpha: Double): DataFrame =
    graft.operators.ClassifierOps.nbClassify(docs, model, idCol, textCol,
      buckets, alpha)

  /** Train-on-one-slice / classify-another confusion matrix:
    * (true_label, pred_label, n_docs). */
  def nbConfusion(train: DataFrame, test: DataFrame, idCol: String,
      labelCol: String, textCol: String, buckets: Int,
      alpha: Double): DataFrame =
    graft.operators.ClassifierOps.nbConfusion(train, test, idCol, labelCol,
      textCol, buckets, alpha)

  /** Dedup-aware (leak-safe) split: hashSplit keyed by the near-dup
    * cluster, so near-duplicates never land in different splits. */
  def leakSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      names: java.util.List[String],
      fractions: java.util.List[java.lang.Double],
      salt: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    SamplingOps.leakSafeSplit(docs, idCol, pairs,
      names.asScala.toSeq.zip(fractions.asScala.toSeq.map(_.doubleValue)),
      salt)
  }

  /** Hard-negative mining: per anchor, the top-k most-similar corpus
    * vectors with a DIFFERENT label. */
  def hardNegativesTopK(anchors: DataFrame, corpus: DataFrame,
      k: Int): DataFrame =
    graft.operators.SimilarityOps.hardNegativesTopK(anchors, corpus, k)

  /** MMR diversified top-k for one query vector:
    * (rank, id, rel, score) in greedy selection order. */
  def mmrSelect(corpus: DataFrame,
      queryVec: java.util.List[java.lang.Double], k: Int, lambda: Double,
      nCandidates: Int, idCol: String, vecCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.SimilarityOps.mmrSelect(corpus,
      queryVec.asScala.toSeq.map(_.doubleValue), k, lambda, nCandidates,
      idCol, vecCol)
  }

  /** Distributed WARC read (one task per archive file, streamed records):
    * (record_type, target_uri, warc_date, content_type, record_id,
    * content, src_file). */
  def readWarc(spark: SparkSession, pathGlob: String): DataFrame =
    graft.sources.WarcIO.read(spark, pathGlob)

  /** Response records with the HTTP envelope stripped:
    * (target_uri, warc_date, html, src_file). */
  def warcResponses(warc: DataFrame): DataFrame =
    graft.sources.WarcIO.responses(warc)

  /** WET-shape conversion records decoded as UTF-8 text:
    * (target_uri, warc_date, text, src_file). */
  def warcConversions(warc: DataFrame): DataFrame =
    graft.sources.WarcIO.conversions(warc)

  /** Probe a persisted perceptual-hash index with a batch of probe
    * hashes: (probe_id, corpus_id, dist). */
  def hammingNearDuplicatesAgainst(index: DataFrame, probes: DataFrame,
      idCol: String, hashCol: String, maxDist: Int, bands: Int): DataFrame =
    graft.operators.MultimodalOps.hammingNearDuplicatesAgainst(
      index, probes, idCol, hashCol, maxDist, bands)

  /** Fixed-round k-core peel at the median initial degree:
    * (node, deg_residual, k_threshold). */
  def kCoreByMedianDegree(edges: DataFrame, rounds: Int): DataFrame =
    GraphOps.kCoreByMedianDegree(edges, rounds)

  /** Stream-stream (or batch) interval join with dual watermarks: right
    * events join same-key left events within [l.ts, l.ts + maxGap];
    * columns come back prefixed l_/r_. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, maxGap: String, watermarkDelay: String): DataFrame =
    graft.streaming.EventStreams.intervalJoin(
      left, right, keyCol, tsCol, maxGap, watermarkDelay)

  /** SCD2 validity intervals from an event log:
    * (keyCol, attrCol, version, valid_from_ms, valid_to_ms) — the
    * point-in-time-correct feature table; compose with [[asofJoin]] for
    * leakage-free lookups. */
  def scd2Intervals(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieBreak: String): DataFrame =
    graft.operators.Sessionize.scd2Intervals(events, keyCol, attrCol,
      tsCol, tieBreak)

  /** Positional-index phrase search: (idCol, n_occurrences) for docs
    * containing the exact token sequence. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.TextOps.phraseSearch(docs, idCol, textCol,
      phrase.asScala.toSeq)
  }

  /** Stream-side NB routing against a batch-trained [[nbTrain]] model —
    * stateless append-mode scoring; predictions equal [[nbClassify]]
    * row-for-row. Works on batch frames too. */
  def streamingNbRoute(docs: DataFrame, model: DataFrame, textCol: String,
      buckets: Int, alpha: Double): DataFrame =
    graft.streaming.EventStreams.streamingNbRoute(docs, model, textCol,
      buckets, alpha)

  /** Exact pairwise Pearson correlations over quantized columns:
    * (col_a, col_b, n, sxy, sxx, syy, corr) — corr is the same IEEE
    * double in any engine computing from the integer sums. */
  def correlationMatrix(df: DataFrame, cols: java.util.List[String],
      scales: java.util.List[java.lang.Long]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.Stats.correlationMatrix(df, cols.asScala.toSeq,
      scales.asScala.toSeq.map(_.longValue))
  }

  /** Per-group HLL distinct-token summaries (deterministic
    * approx_count_distinct GROUP BY analog). */
  def hllSummaryByGroup(docs: DataFrame, groupCol: String,
      textCol: String, p: Int): DataFrame =
    SketchOps.hllSummaryByGroup(docs, groupCol, textCol, p)

  /** Terminal near-dedup: cluster duplicate pairs, keep the min-id
    * representative, return the surviving corpus. */
  def applyNearDedup(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    DedupOps.applyNearDedup(docs, idCol, pairs)

  /** Pairwise association rules with integer-exact confidence/lift:
    * (ante, cons, n_ab, n_ante, n_cons, n_baskets, conf_permille,
    * lift_ppm). */
  def associationRules(incidence: DataFrame, keyCol: String,
      itemCol: String, minPairSupport: Long): DataFrame =
    graft.operators.AssociationOps.associationRules(
      incidence, keyCol, itemCol, minPairSupport)

  /** As above with an explicit basket-size cap (oversized baskets are
    * dropped from pairs, supports and n_baskets; drop count logged). */
  def associationRules(incidence: DataFrame, keyCol: String,
      itemCol: String, minPairSupport: Long, maxBasketSize: Long): DataFrame =
    graft.operators.AssociationOps.associationRules(
      incidence, keyCol, itemCol, minPairSupport, maxBasketSize)

  /** BPE tokenizer training: the learned merge table (merge_rank,
    * left_sym, right_sym, merged, n_pair) over the corpus word histogram. */
  def bpeMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    graft.operators.TokenizerOps.bpeMerges(docs, textCol, numMerges)

  /** Post-training subword statistics: topK final-vocabulary tokens by
    * corpus occurrence (token, n_words, n_occurrences). */
  def bpeTokenStats(docs: DataFrame, textCol: String, numMerges: Int,
      topK: Int): DataFrame =
    graft.operators.TokenizerOps.bpeTokenStats(docs, textCol, numMerges, topK)

  /** Encode the corpus with a freshly trained tokenizer: per-doc word/
    * subword/char counts + chars_per_token_permille. */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame =
    graft.operators.TokenizerOps.bpeEncodeCounts(docs, idCol, textCol,
      numMerges)

  /** Per-group equi-width histogram sketch (groupCol, bin, n) — constant
    * mergeable state, integer-exact binning on cent-quantized values. */
  def histogramSketch(df: DataFrame, groupCol: String, valueCol: String,
      loCents: Long, hiCents: Long, bins: Int): DataFrame =
    SketchOps.histogramSketch(df, groupCol, valueCol, loCents, hiCents, bins)

  /** Percentile estimates off histogram cells:
    * (groupCol, p_permille, bin, est_cents, n_total). */
  def histogramPercentiles(cells: DataFrame, groupCol: String,
      psPermille: java.util.List[Integer], loCents: Long, hiCents: Long,
      bins: Int): DataFrame =
    SketchOps.histogramPercentiles(cells, groupCol,
      scala.jdk.CollectionConverters.ListHasAsScala(psPermille)
        .asScala.map(_.intValue()).toSeq, loCents, hiCents, bins)

  /** Pocket batch-perceptron training over quantized-long features —
    * deterministic, mean-centered, exact integer arithmetic. Output:
    * (feature_idx, feature, center, weight, n_correct, n_total). */
  def perceptronTrain(feats: DataFrame, featureCols: java.util.List[String],
      labelCol: String, iters: Int): DataFrame =
    graft.operators.ClusteringOps.perceptronTrain(feats,
      scala.jdk.CollectionConverters.ListHasAsScala(featureCols)
        .asScala.toSeq, labelCol, iters)

  /** applyNearDedup with a quality-aware representative: each cluster
    * keeps its best row by (scoreCol DESC, id ASC). */
  def applyNearDedupBy(docs: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame =
    graft.operators.DedupOps.applyNearDedupBy(docs, idCol, pairs, scoreCol)

  /** Content-defined chunking: (id, chunk_idx, chunk_pos, chunk_len,
    * chunk) with boundaries that follow content, not offsets. */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, maskBits: Int): DataFrame =
    graft.operators.DedupOps.contentDefinedChunks(docs, idCol, textCol,
      window, maskBits)

  /** Chunk-store dedup savings off contentDefinedChunks (one row). */
  def chunkDedupReport(chunks: DataFrame): DataFrame =
    graft.operators.DedupOps.chunkDedupReport(chunks)

  /** Weighted sampling without replacement (exponential race): k rows
    * with probability proportional to weightCol, deterministic. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String): DataFrame =
    graft.operators.SamplingOps.weightedSample(df, keyCol, weightCol, k, salt)

  /** Per-group k-sigma outlier counts via the exact 128-bit integer
    * z-test: (groupCol, n_total, n_outliers). */
  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      kPermille: Long): DataFrame =
    graft.operators.Stats.zScoreOutliers(df, groupCol, valueCol, kPermille)

  /** Link VCF breakend (BND) records to their mates by INFO MATEID or
    * reciprocal coordinates. Input columns: referenceName, start, names,
    * alternateAllele, annotation. Output: (id, referenceName, start, alt,
    * mate_id, mate_referenceName, mate_start, via). */
  def linkBreakends(variants: DataFrame): DataFrame =
    graft.operators.StructuralVariants.linkBreakends(variants)

  /** Group structural-variant records by INFO EVENT: (event, n_records,
    * n_breakends, referenceNames, min_start, max_start). */
  def breakendEventGroups(variants: DataFrame): DataFrame =
    graft.operators.StructuralVariants.eventGroups(variants)

  /** Per-node triangle counts + clustering coefficient (exact integer
    * rational): (node, n_triangles, deg, coeff_num, coeff_den). */
  def triangleCounts(edges: DataFrame): DataFrame =
    GraphOps.triangleCounts(edges)

  /** Top principal axis of an embedding column as (d, axis_q) — fixed
    * point, bit-identical at any partitioning. */
  def pcaAxis(corpus: DataFrame, vecCol: String, iters: Int): DataFrame =
    graft.operators.ClusteringOps.pcaAxis(corpus, vecCol, iters)

  /** Per-label separation along PC1:
    * (label, n, mean_proj_q, min_proj, max_proj). */
  def pcaLabelProjection(corpus: DataFrame, vecCol: String,
      labelCol: String, iters: Int): DataFrame =
    graft.operators.ClusteringOps.pcaLabelProjection(
      corpus, vecCol, labelCol, iters)

  /** Perceptual image hash table (media_id, dhash) via REAL BMP decode. */
  def imageDHash(media: DataFrame): DataFrame =
    graft.operators.MultimodalOps.imageDHash(media)

  /** Image near-dup pairs (id_a, id_b, dist) by banded Hamming over
    * dHash — pigeonhole-complete for dist < bands. */
  def imageNearDuplicates(media: DataFrame, maxDist: Int,
      bands: Int): DataFrame =
    graft.operators.MultimodalOps.imageNearDuplicates(media, maxDist, bands)

  /** Volume-invariant audio fingerprint table (media_id, afp) via REAL
    * WAV decode. */
  def audioFingerprint(media: DataFrame, windows: Int): DataFrame =
    graft.operators.MultimodalOps.audioFingerprint(media, windows)

  /** Audio near-dup pairs (id_a, id_b, dist) by banded Hamming over the
    * energy fingerprint. */
  def audioNearDuplicates(media: DataFrame, maxDist: Int,
      bands: Int): DataFrame =
    graft.operators.MultimodalOps.audioNearDuplicates(media, maxDist, bands)

  /** Middle-frame perceptual hash table (media_id, vdhash) via REAL AVI
    * decode. */
  def videoDHash(media: DataFrame): DataFrame =
    graft.operators.MultimodalOps.videoDHash(media)

  /** Video near-dup pairs (id_a, id_b, dist) by banded Hamming over the
    * middle-frame dHash. */
  def videoNearDuplicates(media: DataFrame, maxDist: Int,
      bands: Int): DataFrame =
    graft.operators.MultimodalOps.videoNearDuplicates(media, maxDist, bands)

  /** Incremental corpus diff between two snapshots:
    * (idCol, carryCols*, status added|deleted|changed|unchanged). */
  def snapshotDelta(old: DataFrame, nw: DataFrame, idCol: String,
      textCol: String, carryCols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.SnapshotOps.snapshotDelta(old, nw, idCol, textCol,
      carryCols.asScala.toSeq)
  }

  /** The delta rolled up per group: (groupCols*, n_added, n_deleted,
    * n_changed, n_unchanged). */
  def snapshotDeltaReport(delta: DataFrame,
      groupCols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.SnapshotOps.snapshotDeltaReport(delta,
      groupCols.asScala.toSeq)
  }

  /** Token-budget selection: (id, score, tokens, cum_tokens, selected) —
    * the (score DESC, id) greedy prefix under a global token budget,
    * computed by the two-phase distributed cumulative sum. */
  def budgetSelect(docs: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budget: Long): DataFrame =
    SamplingOps.budgetSelect(docs, idCol, scoreCol, tokensCol, budget)

  /** Per-stratum percentile calibration + top-fraction selection:
    * (strataCol, idCol, scoreCol, calibrated, selected). */
  def calibratedSelect(docs: DataFrame, strataCol: String, idCol: String,
      scoreCol: String, keepFraction: Double): DataFrame =
    SamplingOps.calibratedSelect(docs, strataCol, idCol, scoreCol,
      keepFraction)

  /** Bounded-history next-event training examples:
    * (keyCol, tieBreak, history, label). */
  def nextEventExamples(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreak: String, historyLen: Int): DataFrame =
    graft.operators.Sessionize.nextEventExamples(events, keyCol, typeCol,
      tsCol, tieBreak, historyLen)

  /** Explicit salted skew join: result equals the plain equi-join, with
    * the left side salted on `saltKeyCol` and the right replicated. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      usingKeys: java.util.List[String], saltKeyCol: String, salts: Int,
      joinType: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.SkewOps.saltedJoin(left, right,
      usingKeys.asScala.toSeq, saltKeyCol, salts, joinType)
  }

  /** Exact global equal-depth binning — ANSI `NTILE(n)` semantics without
    * the single-partition sort: input columns + `bucket` (1-based). */
  def globalNtile(df: DataFrame, valueCol: String, tieBreak: String,
      n: Int): DataFrame =
    graft.operators.Quantiles.globalNtile(df, valueCol, tieBreak, n)

  /** Key-skew profile: top-k heaviest keys of `keyCol` with count, share
    * and global (rows, distinct-keys) totals — sizes saltedJoin's salts. */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int): DataFrame =
    graft.operators.SkewOps.keySkewReport(df, keyCol, k)

  /** Per-source novelty attribution after exact dedup:
    * (source, n_docs, n_distinct, n_novel, novelty_rate). */
  def sourceNovelty(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame =
    graft.operators.CorpusCompareOps.sourceNovelty(docs, textCol, sourceCol)

  /** Pairwise source cosine over hashed unigram count vectors:
    * (src_a, src_b, n_shared_buckets, cosine). */
  def sourceSimilarity(docs: DataFrame, textCol: String, sourceCol: String,
      buckets: Int): DataFrame =
    graft.operators.CorpusCompareOps.sourceSimilarity(docs, textCol,
      sourceCol, buckets)

  /** Top-k label-discriminative hashed token buckets by exact quantized
    * chi-square: (b, chi2_q). */
  def chiSquareFeatures(docs: DataFrame, labelCol: String, textCol: String,
      buckets: Int, k: Int): DataFrame =
    graft.operators.CorpusCompareOps.chiSquareFeatures(docs, labelCol,
      textCol, buckets, k)

  /** Reciprocal-rank fusion of two (idCol, rankCol) rankings:
    * (idCol, rrf_q, rank_a, rank_b), integer-exact. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
      k: Int, topN: Int): DataFrame =
    graft.operators.RankFusionOps.rrfFuse(a, b, idCol, rankCol, k, topN)

  /** Per-group Gini concentration of a long value column:
    * (groupCol, n_docs, total, gini). */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String): DataFrame =
    graft.operators.Stats.giniByGroup(df, groupCol, valueCol, tieBreak)

  /** k-anonymity release audit over quasi-identifier columns: one row
    * (n_rows, n_classes, min_class_size, n_small_classes,
    * n_rows_at_risk, risk_rate). */
  def kAnonymityReport(df: DataFrame, quasiCols: java.util.List[String],
      k: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.PrivacyOps.kAnonymityReport(df,
      quasiCols.asScala.toSeq, k)
  }

  /** Per-group exact least-squares trend: (group, n_points, slope,
    * intercept). */
  def trendByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame =
    graft.operators.Stats.trendByGroup(df, groupCol, xCol, yCol)

  /** Per-group Wilson lower bound on a boolean pass rate:
    * (group, n_docs, n_pass, wilson_lb). */
  def wilsonRanking(df: DataFrame, groupCol: String, passCol: String,
      z: Double): DataFrame =
    graft.operators.Stats.wilsonRanking(df, groupCol, passCol, z)

  /** Single-pass table profile: one row per column with
    * (col_name, n_rows, n_nulls, n_distinct, n_blank). */
  def profileColumns(df: DataFrame,
      cols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.ProfileOps.profileColumns(df, cols.asScala.toSeq)
  }

  /** Referential-integrity audit:
    * (n_child_rows, n_orphans, orphan_rate). */
  def fkAudit(child: DataFrame, parent: DataFrame, childKey: String,
      parentKey: String): DataFrame =
    graft.operators.ProfileOps.fkAudit(child, parent, childKey, parentKey)

  /** Primary-key uniqueness audit:
    * (n_rows, n_keys, n_dup_keys, n_dup_rows, dup_rate). */
  def pkAudit(df: DataFrame, keyCols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.operators.ProfileOps.pkAudit(df, keyCols.asScala.toSeq)
  }

  /** Score-calibration curve over equal-depth buckets:
    * (bucket, n, n_pos, pos_rate). */
  def calibrationCurve(df: DataFrame, scoreCol: String, outcomeCol: String,
      tieBreak: String, n: Int): DataFrame =
    graft.operators.Quantiles.calibrationCurve(df, scoreCol, outcomeCol,
      tieBreak, n)

  /** Daily + rolling exact distinct actives: (day, dau, rolling). */
  def rollingDistinctActives(events: DataFrame, keyCol: String,
      tsCol: String, windowDays: Int): DataFrame =
    graft.operators.Sessionize.rollingDistinctActives(events, keyCol,
      tsCol, windowDays)

  /** Trailing-window exact z-test anomaly flags over per-group daily
    * counts: input columns + `anomalous`. */
  def volumeAnomalies(daily: DataFrame, groupCol: String, dayCol: String,
      countCol: String, lookback: Int, minHistory: Long,
      kPermille: Long): DataFrame =
    graft.operators.Stats.volumeAnomalies(daily, groupCol, dayCol,
      countCol, lookback, minHistory, kPermille)

  /** Retention triangle: (cohort_day, age_days, n_active). */
  def retentionCohorts(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    graft.operators.Sessionize.retentionCohorts(events, keyCol, tsCol)

  /** Calendar gap fill + forward fill on a keyed daily series:
    * (group, day, value, observed). */
  def calendarFill(daily: DataFrame, groupCol: String, dayCol: String,
      valueCol: String): DataFrame =
    graft.operators.TimeSeriesOps.calendarFill(daily, groupCol, dayCol,
      valueCol)

  /** Pooled two-proportion A/B z-test per experiment group:
    * (group, n_a, n_b, conv_a, conv_b, rate_a, rate_b, significant). */
  def abTestReport(units: DataFrame, groupCol: String, variantCol: String,
      outcomeCol: String): DataFrame =
    graft.operators.Stats.abTestReport(units, groupCol, variantCol,
      outcomeCol)

  /** Domain-scoped boilerplate removal: every occurrence of a paragraph
    * seen in >= minDocs docs of the same group is removed;
    * (idCol, groupCol, textCol, n_removed_paras, removed_chars). */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, minDocs: Int): DataFrame =
    graft.operators.DedupOps.removeBoilerplate(docs, idCol, textCol,
      groupCol, minDocs)

  /** Budget-constrained water-filling mixture allocation:
    * (source, available, weight, capped, allocated). */
  def waterFillAllocation(counts: DataFrame, sourceCol: String,
      availCol: String, weightCol: String, budget: Long): DataFrame =
    graft.operators.SamplingOps.waterFillAllocation(counts, sourceCol,
      availCol, weightCol, budget)

  /** Water-filling with budget = floor(sum(avail) * num / den) folded
    * into the plan (no driver-side sum). */
  def waterFillAllocationFraction(counts: DataFrame, sourceCol: String,
      availCol: String, weightCol: String,
      budgetNum: Long, budgetDen: Long): DataFrame =
    graft.operators.SamplingOps.waterFillAllocation(counts, sourceCol,
      availCol, weightCol, budgetNum, budgetDen)

  /** Deterministic size-balanced serpentine shard assignment:
    * input columns + shard (0-based). */
  def balancedShards(df: DataFrame, sizeCol: String, tieBreak: String,
      nShards: Int): DataFrame =
    graft.operators.ShardOps.balancedShards(df, sizeCol, tieBreak, nShards)

  /** Per-shard balance report: (shard, n_items, total_size). */
  def shardReport(df: DataFrame, sizeCol: String, tieBreak: String,
      nShards: Int): DataFrame =
    graft.operators.ShardOps.shardReport(df, sizeCol, tieBreak, nShards)

  /** Newman modularity of a labeled partition over (src, dst) edges:
    * one row (m, n_within, q_modularity). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame =
    graft.operators.GraphOps.modularity(edges, labels)

  /** Per-group inter-arrival gap profile (exact disc percentiles of
    * consecutive-event gaps in ms): (group, n, p50, p90, p99). */
  def interArrivalStats(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, groupCol: String): DataFrame =
    graft.operators.Sessionize.interArrivalStats(events, keyCol, tsCol,
      idCol, groupCol)

  /** Winsorization audit: per group, exact disc p1/p99 cuts and integer
    * clamp bookkeeping: (group, n, lo_cut, hi_cut, n_low, n_high,
    * sum_cents, sum_winsorized_cents). */
  def winsorizeReport(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String): DataFrame =
    graft.operators.Stats.winsorizeReport(df, groupCol, valueCol, tieBreak)

  /** Dyadic recency-weighted trailing mean over keyed daily series:
    * input columns + (num, den, smoothed). */
  def dyadicTrailingMean(daily: DataFrame, groupCol: String,
      dayCol: String, valueCol: String, window: Int): DataFrame =
    graft.operators.TimeSeriesOps.dyadicTrailingMean(daily, groupCol,
      dayCol, valueCol, window)

  /** Degree assortativity over (src, dst) edges: one row
    * (m, r_assortativity) — NULL r on regular graphs. */
  def assortativity(edges: DataFrame): DataFrame =
    graft.operators.GraphOps.assortativity(edges)

  /** First-touch attribution within a trailing ms window:
    * (key, id, conv_ms, first_touch_ms, gap_ms). */
  def firstTouchAttribution(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String, idCol: String, touchType: String,
      convType: String, windowMs: Long): DataFrame =
    graft.operators.Sessionize.firstTouchAttribution(events, keyCol,
      typeCol, tsCol, idCol, touchType, convType, windowMs)

  /** Incremental connected-component maintenance: merge an existing
    * (id, cluster_id) labeling with new duplicate pairs. */
  def mergeClusters(labels: DataFrame, newPairs: DataFrame): DataFrame =
    graft.operators.DedupOps.mergeClusters(labels, newPairs)

  /** PSI drift report (sideCol true = current slice):
    * (b, n_ref, n_cur, psi_q); total PSI = sum(psi_q)/1e7. */
  def psiReport(df: DataFrame, sideCol: String,
      bucketCol: String): DataFrame =
    graft.operators.CorpusCompareOps.psiReport(df, sideCol, bucketCol)

  /** PSI from pre-aggregated (b, n_ref) x (b, n_cur) count tables. */
  def psiFromCounts(ref: DataFrame, cur: DataFrame): DataFrame =
    graft.operators.CorpusCompareOps.psiFromCounts(ref, cur)

  /** Global top-k under a per-group cap (diversity-quota selection). */
  def cappedTopK(df: DataFrame, scoreCol: String, groupCol: String,
      tieBreak: String, k: Int, perGroupCap: Int): DataFrame =
    graft.operators.SamplingOps.cappedTopK(df, scoreCol, groupCol,
      tieBreak, k, perGroupCap)

  /** MAD robust outlier flags (pure integer decision path):
    * input columns + (med, mad, is_out). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String, kPermille: Long): DataFrame =
    graft.operators.Stats.madOutliers(df, groupCol, valueCol, tieBreak,
      kPermille)

  /** Per-group percent-rank score normalization:
    * input columns + pct_rank in [0, 1]. */
  def percentRankNormalize(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame =
    graft.operators.Stats.percentRankNormalize(df, groupCol, scoreCol)

  /** Horizon (recrawl) dedup by key: input columns + (fresh, epoch). */
  def horizonDedup(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: String, horizonMs: Long): DataFrame =
    graft.operators.DedupOps.horizonDedup(df, keyCol, tsCol, tieBreak,
      horizonMs)

  /** Horizon dedup keyed by normalized-text md5 fingerprint. */
  def horizonDedupText(docs: DataFrame, textCol: String, tsCol: String,
      tieBreak: String, horizonMs: Long): DataFrame =
    graft.operators.DedupOps.horizonDedupText(docs, textCol, tsCol,
      tieBreak, horizonMs)

  /** Deterministic fixed-size per-group sample (md5-rank selection). */
  def hashSampleN(df: DataFrame, groupCol: String, idCol: String,
      n: Int): DataFrame =
    graft.operators.SamplingOps.hashSampleN(df, groupCol, idCol, n)

  /** Padding-waste audit for length-bucketed batching: one row per
    * capacity bucket. */
  def paddingWasteReport(docs: DataFrame, lenCol: String,
      capacities: Array[Long]): DataFrame =
    graft.operators.TokenizerOps.paddingWasteReport(docs, lenCol,
      capacities.toSeq)

  /** Neyman optimal stratified-sampling allocation:
    * (stratum, n_rows, weight_q, alloc). */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
      budget: Long): DataFrame =
    graft.operators.SamplingOps.neymanAllocation(df, stratumCol, valueCol,
      budget)

  /** Exact pairwise cross-source duplication matrix:
    * (src_a, src_b, n_a, n_b, n_shared, jaccard_permille). */
  def sourceOverlapExact(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame =
    graft.operators.CorpusCompareOps.sourceOverlapExact(docs, textCol,
      sourceCol)

  /** Occurrence-weighted out-of-vocabulary rate per source against a
    * supplied vocabulary relation. */
  def oovRate(docs: DataFrame, textCol: String, sourceCol: String,
      vocab: DataFrame, vocabCol: String): DataFrame =
    graft.operators.TokenizerOps.oovRate(docs, textCol, sourceCol, vocab,
      vocabCol)

  /** Filter-impact waterfall over ordered keep-rules given as parallel
    * (name, SQL boolean expression) arrays: one row per rule with
    * isolation failures, first-fail attribution, and survivors. */
  def filterWaterfall(df: DataFrame, ruleNames: Array[String],
      ruleExprs: Array[String]): DataFrame = {
    require(ruleNames.length == ruleExprs.length,
      s"${ruleNames.length} names vs ${ruleExprs.length} exprs")
    graft.operators.ProfileOps.filterWaterfall(df,
      ruleNames.toSeq.zip(ruleExprs.toSeq.map(
        org.apache.spark.sql.functions.expr)))
  }

  /** Integer HITS hub/authority scores over directed edges (src, dst):
    * (node, side 'hub'|'auth', score_q). */
  def hits(edges: DataFrame, iters: Int): DataFrame =
    graft.operators.GraphOps.hits(edges, iters)

  /** Top-k hubs and authorities of [[hits]]. */
  def hitsTopK(edges: DataFrame, iters: Int, k: Int): DataFrame =
    graft.operators.GraphOps.hitsTopK(edges, iters, k)

  /** RFM (recency/frequency/monetary) tier scoring per key:
    * (key, last_ts_ms, n_events, monetary_cents, r_score, f_score,
    * m_score, rfm). */
  def rfmScores(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tiers: Int): DataFrame =
    graft.operators.Sessionize.rfmScores(events, keyCol, tsCol, valueCol,
      tiers)

  /** Nearest-centroid label confusion over an embedding table:
    * (label, predicted, n). */
  def nearestCentroidEval(corpus: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    graft.operators.ClusteringOps.nearestCentroidEval(corpus, labelCol,
      vecCol)

  /** Fixed-bucket burst-activity (bot-likelihood) report:
    * (key, n_events, max_per_bucket, is_burst). */
  def burstActivityReport(events: DataFrame, keyCol: String, tsCol: String,
      bucketMs: Long, burstThreshold: Long): DataFrame =
    graft.operators.Sessionize.burstActivityReport(events, keyCol, tsCol,
      bucketMs, burstThreshold)

  /** Functional-dependency violation audit: top-k determinant values
    * of detCol with >1 distinct depCol value. */
  def fdViolations(df: DataFrame, detCol: String, depCol: String,
      k: Int): DataFrame =
    graft.operators.ProfileOps.fdViolations(df, detCol, depCol, k)

  /** Snapshot-to-snapshot per-column profile drift report. */
  def profileDrift(a: DataFrame, colsA: Array[String], b: DataFrame,
      colsB: Array[String]): DataFrame =
    graft.operators.ProfileOps.profileDrift(a, colsA.toSeq, b, colsB.toSeq)

  /** Top-k consecutive event-type trigram paths: (t1, t2, t3, n_paths). */
  def eventPathTrigrams(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieBreak: String, k: Int): DataFrame =
    graft.operators.Sessionize.eventPathTrigrams(events, keyCol, typeCol,
      tsCol, tieBreak, k)

  /** Per-group embedding-centroid drift vs the global centroid:
    * (groupCol, n_vecs, cosine_to_global). */
  def sourceCentroidDrift(corpus: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    graft.operators.ClusteringOps.sourceCentroidDrift(corpus, groupCol,
      vecCol)

  /** Corpus growth curve per epoch:
    * (day, n_sightings, n_distinct, n_new, cum_distinct). */
  def corpusGrowthCurve(docs: DataFrame, textCol: String,
      dayCol: String): DataFrame =
    graft.operators.SnapshotOps.corpusGrowthCurve(docs, textCol, dayCol)

  /** Domain-level link graph from an HTML column:
    * (src_domain, dst_domain, n_links, n_docs). */
  def linkDomainEdges(docs: DataFrame, srcDomainCol: String,
      htmlCol: String, idCol: String): DataFrame =
    graft.operators.WebOps.linkDomainEdges(docs, srcDomainCol, htmlCol,
      idCol)

  /** The k most-linked destination domains of a link graph. */
  def topLinkedDomains(edges: DataFrame, k: Int): DataFrame =
    graft.operators.WebOps.topLinkedDomains(edges, k)

  /** Rendezvous-shard resize audit:
    * one row (n_keys, n_moved, moved_permille). */
  def rendezvousMoveReport(df: DataFrame, keyCol: String, fromShards: Int,
      toShards: Int): DataFrame =
    graft.operators.ShardOps.rendezvousMoveReport(df, keyCol, fromShards,
      toShards)

  /** Two-sample KS drift statistic:
    * one row (n_ref, n_cur, ks_at, ks_d). */
  def ksDrift(df: DataFrame, sideCol: String, valueCol: String): DataFrame =
    graft.operators.Stats.ksDrift(df, sideCol, valueCol)

  /** Mutual information between two categorical columns:
    * one row (n, n_cells, mi_nats, h_a, h_b, nmi). */
  def mutualInformationReport(df: DataFrame, colA: String,
      colB: String): DataFrame =
    graft.operators.Stats.mutualInformationReport(df, colA, colB)

  /** Cohen's kappa inter-rater agreement:
    * one row (n, n_agree, kappa). */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame =
    graft.operators.Stats.cohenKappa(df, colA, colB)

  /** Benford first-digit audit per group:
    * (groupCol, n, n_skipped, d1..d9, chi2). */
  def benfordAudit(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    graft.operators.Stats.benfordAudit(df, groupCol, valueCol)

  /** Simplified (centroid) silhouette per label:
    * (label, n_vecs, mean_silhouette). */
  def simplifiedSilhouette(corpus: DataFrame, labelCol: String,
      vec: String): DataFrame =
    graft.operators.ClusteringOps.simplifiedSilhouette(corpus, labelCol,
      vec)

  /** CUSUM level-shift changepoint per key over bucketed volumes:
    * (key, n_buckets, total, cp_bucket, cusum_peak, cusum_permille). */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String,
      bucketMs: Long): DataFrame =
    graft.operators.Sessionize.cusumChangepoint(events, keyCol, tsCol,
      bucketMs)

  /** Per-group ROC AUC with exact midrank ties:
    * (group, n_pos, n_neg, auc). */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame =
    graft.operators.Stats.aucByGroup(df, groupCol, scoreCol, labelCol)

  /** Shannon entropy of a value distribution per group:
    * (group, n, n_distinct, entropy_nats). */
  def entropyByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    graft.operators.Stats.entropyByGroup(df, groupCol, valueCol)

  /** Flesch reading-ease per document:
    * (id, n_words, n_sentences, n_syllables, flesch). */
  def fleschReadability(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.operators.TextOps.fleschReadability(docs, idCol, textCol)

  /** Lag-k autocorrelation of bucketed volumes per key:
    * (key, n_pairs, acf). */
  def autocorrByKey(events: DataFrame, keyCol: String, tsCol: String,
      bucketMs: Long, lagK: Int): DataFrame =
    graft.operators.TimeSeriesOps.autocorrByKey(events, keyCol, tsCol,
      bucketMs, lagK)

  /** Personalized PageRank from a seed node set: (node, rank_q). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame =
    graft.operators.GraphOps.personalizedPageRank(edges, seeds, iters)

  /** Top-k of personalized PageRank: (node, rank_q). */
  def personalizedPageRankTopK(edges: DataFrame, seeds: DataFrame,
      iters: Int, k: Int): DataFrame =
    graft.operators.GraphOps.personalizedPageRankTopK(edges, seeds,
      iters, k)

  /** Lexical-richness profile per source:
    * (source, n_tokens, n_types, n_hapax, ttr, hapax_ratio). */
  def hapaxStats(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame =
    graft.operators.TokenizerOps.hapaxStats(docs, textCol, sourceCol)

  /** Ranked-retrieval eval per query:
    * (query, n_rel, rel_at_k, p_at_k, mrr, ndcg). */
  def rankedEval(df: DataFrame, queryCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame =
    graft.operators.RankFusionOps.rankedEval(df, queryCol, rankCol,
      relCol, k)

  /** Smoothed target encoding of a categorical column:
    * (cat, n, sum_cents, encoded). */
  def targetEncode(df: DataFrame, catCol: String, valueCol: String,
      priorWeight: Long): DataFrame =
    graft.operators.Stats.targetEncode(df, catCol, valueCol, priorWeight)

  /** JSON key discovery over a semi-structured column: (key, n_present,
    * present_permille, n_distinct, type census..., n_rows, n_bad). */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame =
    graft.operators.ProfileOps.jsonKeyProfile(df, jsonCol)

  /** Distribution-shape census per group:
    * (group, n, mean, variance, skewness, kurtosis). */
  def momentsByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    graft.operators.Stats.momentsByGroup(df, groupCol, valueCol)

  /** Robust (median/IQR) scaling within each group:
    * input columns + (med, iqr, robust_scaled). */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String): DataFrame =
    graft.operators.Stats.robustScale(df, groupCol, valueCol, tieBreak)

  /** Skip-gram co-occurrence counts: (center, context, n_pairs). */
  def skipGramPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long): DataFrame =
    graft.operators.TextOps.skipGramPairs(docs, idCol, textCol, window,
      minCount)

  /** Exact pre-join cardinality probe: one row (n_keys_a, n_keys_b,
    * n_keys_common, rows_a, rows_b, join_rows, max_key_rows). */
  def joinSizeProbe(a: DataFrame, keyA: String, b: DataFrame,
      keyB: String): DataFrame =
    graft.operators.SkewOps.joinSizeProbe(a, keyA, b, keyB)

  /** Per-transition latency percentiles:
    * (transition, n, p50, p90, p99). */
  def transitionLatency(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame =
    graft.operators.Sessionize.transitionLatency(events, keyCol, typeCol,
      tsCol, idCol)

  /** Per-source PII risk census: (source, n_docs, n_docs_with_pii,
    * pii_permille, n_emails, n_ips, n_phones). */
  def piiCensus(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame =
    graft.operators.TextOps.piiCensus(docs, textCol, sourceCol)

  /** Temporal split leakage audit per consecutive boundary. `order` is
    * comma-separated, earliest split first. */
  def temporalSplitAudit(df: DataFrame, splitCol: String, tsCol: String,
      order: String): DataFrame =
    graft.operators.SamplingOps.temporalSplitAudit(df, splitCol, tsCol,
      order.split(",").toSeq.map(_.trim).filter(_.nonEmpty))

  /** Single-scan numeric profile of integer columns (comma-separated):
    * (col_name, n_rows, n_nulls, min_v, max_v, sum_v, mean_v,
    * variance_v). */
  def numericProfile(df: DataFrame, cols: String): DataFrame =
    graft.operators.ProfileOps.numericProfile(df,
      cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty))

  /** Per-column value-distribution drift between snapshots
    * (comma-separated columns): (col_name, n_ref, n_cur, psi). */
  def columnDrift(a: DataFrame, b: DataFrame, cols: String,
      buckets: Int): DataFrame =
    graft.operators.ProfileOps.columnDrift(a, b,
      cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty), buckets)

  /** Vocabulary coverage curve at comma-separated ascending k values:
    * (k, n_types, covered_tokens, total_tokens, coverage_permille). */
  def vocabCoverage(docs: DataFrame, textCol: String,
      ks: String): DataFrame =
    graft.operators.TokenizerOps.vocabCoverage(docs, textCol,
      ks.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))

  /** Transition/transversion census per group (SNVs only):
    * (group, n_snv, n_ts, n_tv, tstv). */
  def tstvRatio(variants: DataFrame, groupCol: String, refCol: String,
      altCol: String): DataFrame =
    graft.operators.VariantQc.tstvRatio(variants, groupCol, refCol,
      altCol)

  /** Hardy-Weinberg chi-square per site from 0/1/2 genotype classes:
    * (site, n, n_hom_ref, n_het, n_hom_alt, maf, chi2). */
  def hardyWeinberg(genotypes: DataFrame, siteCol: String,
      gtClassCol: String): DataFrame =
    graft.operators.VariantQc.hardyWeinberg(genotypes, siteCol,
      gtClassCol)

  /** Genotype-concordance confusion grid between two callsets, keys
    * comma-separated: (class_a, class_b, n). */
  def genotypeConcordance(a: DataFrame, b: DataFrame, keys: String,
      classCol: String): DataFrame =
    graft.operators.VariantQc.genotypeConcordance(a, b,
      keys.split(",").toSeq.map(_.trim).filter(_.nonEmpty), classCol)

  /** Allele-frequency spectrum histogram: (bin, n_sites). */
  def alleleFrequencySpectrum(variants: DataFrame, acCol: String,
      anCol: String, bins: Int): DataFrame =
    graft.operators.VariantQc.alleleFrequencySpectrum(variants, acCol,
      anCol, bins)

  /** Coverage-uniformity census per contig: (referenceName, bases,
    * mean_depth, within_band_permille). */
  def coverageUniformity(coverage: DataFrame): DataFrame =
    graft.operators.VariantQc.coverageUniformity(coverage)

  /** Mendelian-consistency grid over trio genotype classes:
    * (father_gt, mother_gt, child_gt, violation, n). */
  def mendelianViolations(trios: DataFrame, fatherCol: String,
      motherCol: String, childCol: String): DataFrame =
    graft.operators.VariantQc.mendelianViolations(trios, fatherCol,
      motherCol, childCol)

  /** Fleiss' kappa for N raters per item (one row per rating):
    * (n_items, n_raters, n_categories, p_bar, p_e, kappa). */
  def fleissKappa(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame =
    graft.operators.Stats.fleissKappa(df, itemCol, labelCol)

  /** Deterministic Poisson-bootstrap CI of the per-group mean:
    * (group, n, mean, boot_lo, boot_hi, n_boot). */
  def bootstrapCi(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, b: Int): DataFrame =
    graft.operators.SamplingOps.bootstrapCi(df, groupCol, valueCol,
      idCol, b)

  /** Weekly (dow, hour) seasonality profile per key:
    * (key, dow, hour, n, key_total, slot_total, ratio_permille). */
  def seasonalProfile(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    graft.operators.TimeSeriesOps.seasonalProfile(df, keyCol, tsCol)

  /** Pairwise KING-robust kinship over a bounded cohort: (sample_i,
    * sample_j, n_shared, n_both_het, n_opp_hom, n_het_i, n_het_j,
    * kinship). */
  def kingKinship(genotypes: DataFrame, sampleCol: String,
      siteCol: String, gtCol: String, maxSamples: Long): DataFrame =
    graft.operators.VariantQc.kingKinship(genotypes, sampleCol, siteCol,
      gtCol, maxSamples)

  /** Per-sample inbreeding coefficient F vs cohort allele frequencies:
    * (sample, n_called, n_het, exp_het, f). */
  def inbreedingF(genotypes: DataFrame, sampleCol: String,
      siteCol: String, gtCol: String): DataFrame =
    graft.operators.VariantQc.inbreedingF(genotypes, sampleCol, siteCol,
      gtCol)

  /** 12-class SNV substitution census: (ref_allele, alt_allele, n,
    * permille). */
  def substitutionMatrix(variants: DataFrame, refCol: String,
      altCol: String): DataFrame =
    graft.operators.VariantQc.substitutionMatrix(variants, refCol,
      altCol)

  /** Indel length spectrum with edge-bin clamping: (dlen, n_indels). */
  def indelLengthSpectrum(variants: DataFrame, refCol: String,
      altCol: String, maxAbsLen: Int): DataFrame =
    graft.operators.VariantQc.indelLengthSpectrum(variants, refCol,
      altCol, maxAbsLen)

  /** Per-sample call-rate / genotype-class census: (sample, n_total,
    * n_called, n_het, n_hom_ref, n_hom_alt, n_other,
    * call_rate_permille, het_permille). */
  def callRate(genotypes: DataFrame, sampleCol: String,
      gtCol: String): DataFrame =
    graft.operators.VariantQc.callRate(genotypes, sampleCol, gtCol)

  /** Split-conformal calibration audit: (n_cal, threshold, n_eval,
    * n_covered, coverage_permille). */
  def conformalCoverage(cal: DataFrame, eval: DataFrame,
      scoreCol: String, alphaPermille: Int): DataFrame =
    graft.operators.LabelQaOps.conformalCoverage(cal, eval, scoreCol,
      alphaPermille)

  /** Confident-learning label-noise census: (given_label, pred_label,
    * n, n_confident). */
  def confidentLearningGrid(df: DataFrame, givenCol: String,
      predCol: String, confPermilleCol: String): DataFrame =
    graft.operators.LabelQaOps.confidentLearningGrid(df, givenCol,
      predCol, confPermilleCol)

  /** ECE/reliability report over stated confidence: (bin, n,
    * conf_permille, acc_permille, gap_permille, ece_permille). */
  def calibrationBins(df: DataFrame, confPermilleCol: String,
      correctCol: String, bins: Int): DataFrame =
    graft.operators.LabelQaOps.calibrationBins(df, confPermilleCol,
      correctCol, bins)

  /** Per-group trimmed mean: (group, n, n_kept, trimmed_mean). */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String,
      valueCol: String, tieBreak: String, loPermille: Int,
      hiPermille: Int): DataFrame =
    graft.operators.Stats.trimmedMeanByGroup(df, groupCol, valueCol,
      tieBreak, loPermille, hiPermille)

  /** Per-group Atkinson (eps=2) inequality index: (group, n,
    * atkinson). */
  def atkinsonIndex(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    graft.operators.Stats.atkinsonIndex(df, groupCol, valueCol)

  /** Per-group median + median absolute deviation: (group, n, median,
    * mad). */
  def madByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieBreak: String): DataFrame =
    graft.operators.Stats.madByGroup(df, groupCol, valueCol, tieBreak)
}
