"""graft — PySpark bindings for the graft Spark analytics engine.

Source-only wrapper over the ``graft.api.JavaApi`` py4j facade (the same
call path PySpark itself uses for every DataFrame operation): each function
hands py4j ``DataFrame._jdf`` handles to the JVM-side static facade and
wraps the returned JVM DataFrame back. No server process, no serialization
beyond what PySpark already does — the plan stays 100% JVM-side.

Usage (any PySpark session whose JVM classpath includes the graft jar)::

    from pyspark.sql import SparkSession
    import graft

    spark = (SparkSession.builder
             .config("spark.jars", "/path/to/graft.jar")
             .getOrCreate())

    reads = graft.load_alignments(spark, "sample.bam")
    deduped = graft.mark_duplicates(reads)
    stats = graft.flag_stat(deduped)

    docs = spark.read.parquet("documents.parquet")
    pairs = graft.minhash_near_duplicates(docs, "doc_id", "text",
                                          num_hashes=128, bands=32,
                                          threshold=0.8)

This mirrors the reference's adam-python ``bdgenomics.adam`` package
(adam-python/bdgenomics/adam/ds.py), re-expressed for the DataFrame-first
engine: functions take and return plain PySpark DataFrames instead of
wrapping them in genomic dataset classes.

NOTE: this container has no PySpark available to the build, so this module
ships as documented source verified against the JavaApi signatures (the
JVM side is spec-tested in JavaApiSpec); it is not exercised by CI here.
"""

__all__ = [
    "load_alignments", "load_features", "load_variants", "load_genotypes",
    "mark_duplicates", "flag_stat", "count_kmers", "to_coverage",
    "collapse_coverage", "bin_qualities", "region_join",
    "region_join_flanked", "broadcast_region_join", "overlap_counts",
    "exact_duplicates", "drop_exact_duplicates", "fingerprints",
    "dedup_paragraphs", "duplicated_paragraphs", "c4_clean_lines",
    "dedup_lines_in_doc",
    "duplicated_substring_spans", "remove_duplicated_substrings",
    "gopher_quality_rules", "token_frequencies",
    "exact_duplicates_against", "minhash_signatures",
    "minhash_near_duplicates", "minhash_near_duplicates_against",
    "simhash_signatures", "simhash_near_duplicates",
    "simhash_near_duplicates_against", "jaccard_similarity_join",
    "cluster_duplicates", "srp_signatures", "lsh_top_k_against",
    "brute_force_top_k", "lsh_top_k", "ivf_top_k",
    "cosine_near_duplicates", "quality_filter", "lang_id", "redact_pii",
    "pack_token_spans", "extract_image_features", "extract_audio_features",
    "image_stats", "audio_stats", "video_stats", "sample_frames",
    "stratified_sample",
    "semantic_duplicates", "dsir_index", "dsir_score_against",
    "dsir_weights", "lm_index", "lm_score_against",
    "ivf_centroids", "ivf_assignments", "ivf_top_k_against", "asof_join",
    "extract_html_text", "canonicalize_urls", "url_dedup",
    "kmeans_fit", "kmeans_assign", "kmeans_centroids_as_float",
    "hash_split", "temperature_mix", "contamination_report",
]

_FACADE = "graft.api.JavaApi"


def _api(spark):
    return getattr(spark._jvm, _FACADE)


def _wrap(spark, jdf):
    from pyspark.sql import DataFrame
    return DataFrame(jdf, spark._wrapped if hasattr(spark, "_wrapped") else spark)


# ------------------------------- loaders ---------------------------------

def load_alignments(spark, path):
    """Extension-dispatch alignment load (SAM/BAM/CRAM/parquet)."""
    return _wrap(spark, _api(spark).loadAlignments(spark._jsparkSession, path))


def load_features(spark, path):
    return _wrap(spark, _api(spark).loadFeatures(spark._jsparkSession, path))


def load_variants(spark, path):
    return _wrap(spark, _api(spark).loadVariants(spark._jsparkSession, path))


def load_genotypes(spark, path):
    return _wrap(spark, _api(spark).loadGenotypes(spark._jsparkSession, path))


# ------------------------------ genomics ---------------------------------

def mark_duplicates(alignments):
    s = alignments.sparkSession
    return _wrap(s, _api(s).markDuplicates(alignments._jdf))


def flag_stat(alignments):
    s = alignments.sparkSession
    return _wrap(s, _api(s).flagStat(alignments._jdf))


def count_kmers(alignments, k):
    s = alignments.sparkSession
    return _wrap(s, _api(s).countKmers(alignments._jdf, k))


def to_coverage(alignments):
    s = alignments.sparkSession
    return _wrap(s, _api(s).toCoverage(alignments._jdf))


def collapse_coverage(coverage):
    s = coverage.sparkSession
    return _wrap(s, _api(s).collapseCoverage(coverage._jdf))


def bin_qualities(alignments):
    s = alignments.sparkSession
    return _wrap(s, _api(s).binQualities(alignments._jdf))


def region_join(left, right, join_type="inner"):
    """Interval-overlap join; both sides need referenceName/start/end."""
    s = left.sparkSession
    return _wrap(s, _api(s).regionJoin(left._jdf, right._jdf, join_type))


def region_join_flanked(left, right, join_type, flank):
    s = left.sparkSession
    return _wrap(s, _api(s).regionJoinFlanked(left._jdf, right._jdf,
                                              join_type, flank))


def broadcast_region_join(left, right, join_type="inner"):
    s = left.sparkSession
    return _wrap(s, _api(s).broadcastRegionJoin(left._jdf, right._jdf,
                                                join_type))


def overlap_counts(left, right):
    s = left.sparkSession
    return _wrap(s, _api(s).overlapCounts(left._jdf, right._jdf))


# ----------------------------- dedup / text ------------------------------

def exact_duplicates(docs, id_col, text_col):
    s = docs.sparkSession
    return _wrap(s, _api(s).exactDuplicates(docs._jdf, id_col, text_col))


def dedup_paragraphs(docs, id_col, text_col, sep="\n\n"):
    """C4-style paragraph dedup: keep each paragraph's global first occurrence."""
    s = docs.sparkSession
    return _wrap(s, _api(s).dedupParagraphs(docs._jdf, id_col, text_col, sep))


def duplicated_paragraphs(docs, id_col, text_col, sep="\n\n"):
    """Paragraphs occurring more than once across the corpus, with counts."""
    s = docs.sparkSession
    return _wrap(s, _api(s).duplicatedParagraphs(docs._jdf, id_col, text_col,
                                                 sep))


def c4_clean_lines(docs, text_col, min_words=3):
    """C4 line-level cleaning: rewrite text_col to its surviving lines."""
    s = docs.sparkSession
    return _wrap(s, _api(s).c4CleanLines(docs._jdf, text_col, min_words))


def dedup_lines_in_doc(docs, text_col, sep="\n"):
    """Remove repeated lines within each doc (first occurrence wins)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).dedupLinesInDoc(docs._jdf, text_col, sep))


def drop_exact_duplicates(docs, id_col, text_col):
    s = docs.sparkSession
    return _wrap(s, _api(s).dropExactDuplicates(docs._jdf, id_col, text_col))


def token_frequencies(docs, text_col, k):
    """Corpus top-k lowercase token frequencies (vocabulary building)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).tokenFrequencies(docs._jdf, text_col, k))


def gopher_quality_rules(docs, text_col):
    """Append Gopher (Rae et al. 2021 A1.1) rule columns and a keep flag."""
    s = docs.sparkSession
    return _wrap(s, _api(s).gopherQualityRules(docs._jdf, text_col))


def duplicated_substring_spans(docs, id_col, text_col, min_len):
    """ExactSubstr: merged [start, end) spans of duplicated min_len-grams."""
    s = docs.sparkSession
    return _wrap(s, _api(s).duplicatedSubstringSpans(
        docs._jdf, id_col, text_col, min_len))


def remove_duplicated_substrings(docs, id_col, text_col, min_len):
    """ExactSubstr removal keeping each gram's corpus-wide first occurrence."""
    s = docs.sparkSession
    return _wrap(s, _api(s).removeDuplicatedSubstrings(
        docs._jdf, id_col, text_col, min_len))


def fingerprints(docs, id_col, text_col):
    s = docs.sparkSession
    return _wrap(s, _api(s).fingerprints(docs._jdf, id_col, text_col))


def exact_duplicates_against(incoming, index, id_col, text_col):
    s = incoming.sparkSession
    return _wrap(s, _api(s).exactDuplicatesAgainst(incoming._jdf, index._jdf,
                                                   id_col, text_col))


def minhash_signatures(docs, id_col, text_col, num_hashes=128, shingle_n=3):
    s = docs.sparkSession
    return _wrap(s, _api(s).minhashSignatures(docs._jdf, id_col, text_col,
                                              num_hashes, shingle_n))


def minhash_near_duplicates(docs, id_col, text_col, num_hashes=128,
                            shingle_n=3, bands=32, threshold=0.8):
    s = docs.sparkSession
    return _wrap(s, _api(s).minhashNearDuplicates(
        docs._jdf, id_col, text_col, num_hashes, shingle_n, bands, threshold))


def minhash_near_duplicates_against(incoming, index, id_col, text_col,
                                    num_hashes=128, shingle_n=3, bands=32,
                                    threshold=0.8):
    s = incoming.sparkSession
    return _wrap(s, _api(s).minhashNearDuplicatesAgainst(
        incoming._jdf, index._jdf, id_col, text_col, num_hashes, shingle_n,
        bands, threshold))


def simhash_signatures(docs, id_col, text_col):
    s = docs.sparkSession
    return _wrap(s, _api(s).simhashSignatures(docs._jdf, id_col, text_col))


def simhash_near_duplicates(docs, id_col, text_col, max_dist=3):
    s = docs.sparkSession
    return _wrap(s, _api(s).simhashNearDuplicates(docs._jdf, id_col,
                                                  text_col, max_dist))


def simhash_near_duplicates_against(incoming, index, id_col, text_col,
                                    max_dist=3):
    s = incoming.sparkSession
    return _wrap(s, _api(s).simhashNearDuplicatesAgainst(
        incoming._jdf, index._jdf, id_col, text_col, max_dist))


def jaccard_similarity_join(docs, id_col, text_col, shingle_n=3,
                            threshold=0.5):
    s = docs.sparkSession
    return _wrap(s, _api(s).jaccardSimilarityJoin(docs._jdf, id_col,
                                                  text_col, shingle_n,
                                                  threshold))


def cluster_duplicates(pairs):
    """Connected components over (id_a, id_b) near-duplicate pairs."""
    s = pairs.sparkSession
    return _wrap(s, _api(s).clusterDuplicates(pairs._jdf))


# --------------------------- similarity search ---------------------------

def srp_signatures(corpus, num_bits):
    s = corpus.sparkSession
    return _wrap(s, _api(s).srpSignatures(corpus._jdf, num_bits))


def lsh_top_k_against(queries, signed_corpus, k, num_bits, bands):
    s = queries.sparkSession
    return _wrap(s, _api(s).lshTopKAgainst(queries._jdf, signed_corpus._jdf,
                                           k, num_bits, bands))


def brute_force_top_k(queries, corpus, k):
    s = queries.sparkSession
    return _wrap(s, _api(s).bruteForceTopK(queries._jdf, corpus._jdf, k))


def lsh_top_k(queries, corpus, k, num_bits, bands):
    s = queries.sparkSession
    return _wrap(s, _api(s).lshTopK(queries._jdf, corpus._jdf, k, num_bits,
                                    bands))


def ivf_top_k(queries, corpus, k, n_centroids, n_probe):
    s = queries.sparkSession
    return _wrap(s, _api(s).ivfTopK(queries._jdf, corpus._jdf, k,
                                    n_centroids, n_probe))


def cosine_near_duplicates(vectors, id_col, vec_col, threshold):
    s = vectors.sparkSession
    return _wrap(s, _api(s).cosineNearDuplicates(vectors._jdf, id_col,
                                                 vec_col, threshold))


# ------------------------------ pipelines --------------------------------

def quality_filter(docs, text_col, min_score):
    s = docs.sparkSession
    return _wrap(s, _api(s).qualityFilter(docs._jdf, text_col, min_score))


def lang_id(docs, text_col):
    s = docs.sparkSession
    return _wrap(s, _api(s).langId(docs._jdf, text_col))


def redact_pii(docs, text_col):
    s = docs.sparkSession
    return _wrap(s, _api(s).redactPii(docs._jdf, text_col))


def pack_token_spans(docs, id_col, text_col, seq_len, order_col=None):
    s = docs.sparkSession
    return _wrap(s, _api(s).packTokenSpans(docs._jdf, id_col, text_col,
                                           seq_len,
                                           order_col if order_col else id_col))


def extract_image_features(media):
    s = media.sparkSession
    return _wrap(s, _api(s).extractImageFeatures(media._jdf))


def extract_audio_features(media, window_samples=256, hop_samples=128):
    s = media.sparkSession
    return _wrap(s, _api(s).extractAudioFeatures(media._jdf, window_samples,
                                                 hop_samples))


def image_stats(media):
    """Integer-exact per-bin image stats via the real BMP codec."""
    s = media.sparkSession
    return _wrap(s, _api(s).imageStats(media._jdf))


def audio_stats(media, window_samples=256):
    """Integer-exact per-window audio stats via the real WAV codec."""
    s = media.sparkSession
    return _wrap(s, _api(s).audioStats(media._jdf, window_samples))


def video_stats(media):
    """Integer-exact per-frame video stats via the real AVI codec."""
    s = media.sparkSession
    return _wrap(s, _api(s).videoStats(media._jdf))


def sample_frames(media, n):
    """n evenly spaced frames: real decode for AVI, stub chunks otherwise."""
    s = media.sparkSession
    return _wrap(s, _api(s).sampleFrames(media._jdf, n))


def stratified_sample(docs, strata_col, key_col, rates, default_rate):
    """rates: dict of stratum value -> keep rate in [0, 1]."""
    s = docs.sparkSession
    jmap = s._jvm.java.util.HashMap()
    for k, v in rates.items():
        jmap.put(k, float(v))
    return _wrap(s, _api(s).stratifiedSample(docs._jdf, strata_col, key_col,
                                             jmap, default_rate))


def semantic_duplicates(corpus, id_col, vec_col, n_clusters, threshold):
    """SemDeDup: (id, cid, dropped) — see SimilarityOps.semanticDuplicates."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).semanticDuplicates(corpus._jdf, id_col, vec_col,
                                               n_clusters, float(threshold)))


def dsir_index(docs, id_col, text_col, target_expr, buckets):
    """DSIR bucket multinomials; target_expr is a SQL boolean over docs."""
    s = docs.sparkSession
    return _wrap(s, _api(s).dsirIndex(docs._jdf, id_col, text_col,
                                      target_expr, buckets))


def dsir_score_against(docs, index, text_col, buckets):
    s = docs.sparkSession
    return _wrap(s, _api(s).dsirScoreAgainst(docs._jdf, index._jdf,
                                             text_col, buckets))


def dsir_weights(docs, id_col, text_col, target_expr, k, buckets):
    s = docs.sparkSession
    return _wrap(s, _api(s).dsirWeights(docs._jdf, id_col, text_col,
                                        target_expr, k, buckets))


def lm_index(docs, text_col, buckets):
    """Hashed bigram LM count table (CCNet-style quality scoring)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).lmIndex(docs._jdf, text_col, buckets))


def lm_score_against(docs, index, text_col, buckets):
    s = docs.sparkSession
    return _wrap(s, _api(s).lmScoreAgainst(docs._jdf, index._jdf,
                                           text_col, buckets))


def ivf_centroids(corpus, n_centroids):
    s = corpus.sparkSession
    return _wrap(s, _api(s).ivfCentroids(corpus._jdf, n_centroids))


def ivf_assignments(corpus, centroids):
    s = corpus.sparkSession
    return _wrap(s, _api(s).ivfAssignments(corpus._jdf, centroids._jdf))


def ivf_top_k_against(queries, assigned, centroids, k, n_probe):
    s = queries.sparkSession
    return _wrap(s, _api(s).ivfTopKAgainst(queries._jdf, assigned._jdf,
                                           centroids._jdf, k, n_probe))


def asof_join(left, right, keys, left_time, right_time, right_cols,
              right_tie_break):
    """Backward as-of join; keys/right_cols are lists of column names."""
    s = left.sparkSession
    jkeys = s._jvm.java.util.ArrayList()
    for k in keys:
        jkeys.add(k)
    jcols = s._jvm.java.util.ArrayList()
    for c in right_cols:
        jcols.add(c)
    return _wrap(s, _api(s).asofJoin(left._jdf, right._jdf, jkeys, left_time,
                                     right_time, jcols, right_tie_break))


def extract_html_text(docs, html_col, out_col="text"):
    """HTML -> text extraction (tag strip, entity decode, block newlines)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).extractHtmlText(docs._jdf, html_col, out_col))


def canonicalize_urls(docs, url_col, out_col="url_canon"):
    """Canonical URL column (case, www., ports, tracking params, sorting)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).canonicalizeUrls(docs._jdf, url_col, out_col))


def url_dedup(docs, url_col, id_col):
    """URL-level dedup on the canonical form: (id_col, url, n_dups)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).urlDedup(docs._jdf, url_col, id_col))


def kmeans_fit(corpus, k, iters, id_col="vec_id", vec_col="embedding"):
    """Fixed-point Lloyd k-means centroids: (ci, cqvec longs)."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).kmeansFit(corpus._jdf, k, iters, id_col, vec_col))


def kmeans_assign(corpus, centroids, id_col="vec_id", vec_col="embedding"):
    """Nearest-centroid probe against a fitted table: (id, cid)."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).kmeansAssign(corpus._jdf, centroids._jdf,
                                         id_col, vec_col))


def kmeans_centroids_as_float(centroids):
    """De-quantized (ci, cvec float) view for the IVF/SemDeDup consumers."""
    s = centroids.sparkSession
    return _wrap(s, _api(s).kmeansCentroidsAsFloat(centroids._jdf))


def hash_split(docs, key_col, splits, salt="graft"):
    """Deterministic named dataset split: splits is an ordered list of
    (name, fraction) pairs summing to 1; adds a `split` column whose
    assignment is a pure hash of the key (stable across runs and corpus
    growth, unlike randomSplit)."""
    s = docs.sparkSession
    names = [n for n, _ in splits]
    fractions = [float(f) for _, f in splits]
    return _wrap(s, _api(s).hashSplit(docs._jdf, key_col, names, fractions,
                                      salt))


def temperature_mix(docs, strata_col, key_col, alpha, target_rows,
                    salt="graft"):
    """Temperature-scaled stratum mixture (w_s proportional to n_s^alpha)
    down-sampled to an expected target_rows total."""
    s = docs.sparkSession
    return _wrap(s, _api(s).temperatureMix(docs._jdf, strata_col, key_col,
                                           float(alpha), int(target_rows),
                                           salt))


def contamination_report(corpus, benchmark, id_col, text_col,
                         bench_text_col, ngram_n=8, max_fraction=0.2):
    """Per-document benchmark-overlap report: (id, n_grams, n_hits,
    contaminated at max_fraction distinct-gram overlap)."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).contaminationReport(
        corpus._jdf, benchmark._jdf, id_col, text_col, bench_text_col,
        int(ngram_n), float(max_fraction)))


def global_line_dedup(docs, id_col="doc_id", text_col="text", min_docs=2):
    """Cross-document boilerplate line removal (RefinedWeb-style): lines in
    >= min_docs distinct docs are removed everywhere; returns
    (id_col, cleaned_text, n_removed)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).globalLineDedup(docs._jdf, id_col, text_col,
                                            int(min_docs)))


def chunk_documents(docs, id_col="doc_id", text_col="text",
                    size=2048, stride=1536):
    """Sliding-window character chunking: (id_col, chunk_id, chunk_text,
    chunk_len); the last chunk may be shorter, empty docs keep one empty
    chunk."""
    s = docs.sparkSession
    return _wrap(s, _api(s).chunkDocuments(docs._jdf, id_col, text_col,
                                           int(size), int(stride)))


def collocations_pmi(docs, text_col="text", min_count=5, k=100):
    """Top-k adjacent-bigram collocations by quantized PMI:
    (w1, w2, c12, pmi_q in 1e-7 units)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).collocationsPmi(docs._jdf, text_col,
                                            int(min_count), int(k)))


def edit_distance_near_duplicates(docs, id_col="doc_id", str_col="text",
                                  max_dist=2):
    """PassJoin edit-distance near-dup pairs (never all-pairs):
    (id_a, id_b, dist) with id_a < id_b."""
    s = docs.sparkSession
    return _wrap(s, _api(s).editDistanceNearDuplicates(docs._jdf, id_col,
                                                       str_col,
                                                       int(max_dist)))


def event_transitions(events, key_col="user_id", type_col="event_type",
                      ts_col="ts", tie_break="event_id"):
    """Per-key Markov transition counts over the time-ordered event
    stream: (from_type, to_type, n_transitions)."""
    s = events.sparkSession
    return _wrap(s, _api(s).eventTransitions(events._jdf, key_col, type_col,
                                             ts_col, tie_break))


def disc_percentiles(df, group_col, value_col, tie_break, ps):
    """Exact grouped percentile_disc via distributed rank (no buffering
    aggregate): (group_col, n, p<pct>...)."""
    s = df.sparkSession
    return _wrap(s, _api(s).discPercentiles(df._jdf, group_col, value_col,
                                            tie_break,
                                            [float(p) for p in ps]))


def zorder_write(df, path, cols, num_files=64, bits_per_dim=16):
    """Morton-curve clustered parquet rewrite: row-group min/max become
    tight on EVERY listed dimension, so filters on any of them prune."""
    s = df.sparkSession
    _api(s).zOrderWrite(df._jdf, path, cols, int(num_files),
                        int(bits_per_dim))


def containment_join(docs, id_col="doc_id", text_col="text", shingle_n=3,
                     threshold=0.8):
    """Containment (subset) similarity pairs — finds quote/embedding
    relationships MinHash-Jaccard banding cannot recall:
    (id_a, id_b, n_inter, c_a, c_b)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).containmentJoin(docs._jdf, id_col, text_col,
                                            int(shingle_n),
                                            float(threshold)))


def cms_heavy_hitters(docs, text_col="text", depth=4, width=1024, top_k=20):
    """Exact top tokens with their count-min sketch point estimates:
    (token, n_exact, n_est, overcount). The sketch grid is depth x width
    and merges associatively — the scale path for streaming/huge corpora."""
    s = docs.sparkSession
    return _wrap(s, _api(s).cmsHeavyHitters(docs._jdf, text_col, int(depth),
                                            int(width), int(top_k)))


def hll_summary(docs, text_col="text", p=10):
    """HyperLogLog distinct-token summary with an integer-exact estimator
    (bit-identical at any partitioning): one row of
    (n_tokens, n_distinct, v_zero, s_q, est_q, err_permille)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).hllSummary(docs._jdf, text_col, int(p)))


def bottom_k_sketch(docs, group_col="source", text_col="text", shingle_n=3,
                    k=256):
    """Bottom-k shingle-set sketch per group: the k smallest distinct
    shingle hashes, as rows (group, h, r)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).bottomKSketch(docs._jdf, group_col, text_col,
                                          int(shingle_n), int(k)))


def sketch_overlap(sketches, k=256):
    """Pairwise corpus-overlap estimates from bottom-k sketches:
    (grp_a, grp_b, k_used, n_shared, est_jaccard)."""
    s = sketches.sparkSession
    return _wrap(s, _api(s).sketchOverlap(sketches._jdf, int(k)))


def co_occurrence_edges(incidence, key_col, item_col):
    """Undirected co-occurrence (market-basket) edges (src, dst) from an
    incidence list — feeds page_rank."""
    s = incidence.sparkSession
    return _wrap(s, _api(s).coOccurrenceEdges(incidence._jdf, key_col,
                                              item_col))


def page_rank(edges, iters=5, scale=1000000000, top_k=None):
    """Fixed-point integer PageRank over edges(src, dst) — deterministic
    at any cluster size. Returns (node, rank_q); top_k limits to the k
    highest-centrality nodes with a deterministic tie-break."""
    s = edges.sparkSession
    if top_k is None:
        return _wrap(s, _api(s).pageRank(edges._jdf, int(iters), int(scale)))
    return _wrap(s, _api(s).pageRankTopK(edges._jdf, int(iters), int(top_k),
                                         int(scale)))


def label_propagation(edges, rounds=4, top_k=None):
    """Deterministic label-propagation communities over edges(src, dst):
    most-frequent-neighbor-label rounds with smallest-label ties —
    bit-identical at any partitioning, unlike classic randomized LPA.
    Returns (node, lbl); top_k returns the k largest communities as
    (community, n_nodes) instead."""
    s = edges.sparkSession
    if top_k is None:
        return _wrap(s, _api(s).labelPropagation(edges._jdf, int(rounds)))
    return _wrap(s, _api(s).labelPropagationCommunities(
        edges._jdf, int(rounds), int(top_k)))


def nb_train(docs, label_col, text_col="text", buckets=4096):
    """Multinomial Naive Bayes model over hashed token buckets:
    (label, b, c) counts plus one b = -1 document-count row per label."""
    s = docs.sparkSession
    return _wrap(s, _api(s).nbTrain(docs._jdf, label_col, text_col,
                                    int(buckets)))


def nb_classify(docs, model, id_col="doc_id", text_col="text",
                buckets=4096, alpha=1.0):
    """Classify against an nb_train model: (id, pred_label, score_q) with
    integer-quantized log scores and label-ascending ties."""
    s = docs.sparkSession
    return _wrap(s, _api(s).nbClassify(docs._jdf, model._jdf, id_col,
                                       text_col, int(buckets), float(alpha)))


def nb_confusion(train, test, id_col="doc_id", label_col="lang",
                 text_col="text", buckets=4096, alpha=1.0):
    """Train-on-one-slice / classify-another confusion matrix:
    (true_label, pred_label, n_docs)."""
    s = train.sparkSession
    return _wrap(s, _api(s).nbConfusion(train._jdf, test._jdf, id_col,
                                        label_col, text_col, int(buckets),
                                        float(alpha)))


def scd2_intervals(events, key_col, attr_col, ts_col="ts",
                   tie_break="event_id"):
    """SCD2 validity intervals: (key, attr, version, valid_from_ms,
    valid_to_ms) — point-in-time-correct features; compose with asof_join
    for leakage-free lookups."""
    s = events.sparkSession
    return _wrap(s, _api(s).scd2Intervals(events._jdf, key_col, attr_col,
                                          ts_col, tie_break))


def phrase_search(docs, phrase, id_col="doc_id", text_col="text"):
    """Positional-index phrase search: (id, n_occurrences) for documents
    containing the exact token sequence (list of words)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).phraseSearch(docs._jdf, id_col, text_col,
                                         [str(w) for w in phrase]))


def streaming_nb_route(docs, model, text_col="text", buckets=4096,
                       alpha=1.0):
    """Stateless NB scoring against a batch-trained nb_train model —
    append-mode streaming (or batch) serving; predictions equal
    nb_classify row-for-row. Appends (pred_label, score_q)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).streamingNbRoute(docs._jdf, model._jdf,
                                             text_col, int(buckets),
                                             float(alpha)))


def leak_safe_split(docs, id_col, pairs, splits, salt="graft"):
    """Dedup-aware split: hash_split keyed by the near-dup cluster so no
    near-duplicate pair crosses a split boundary. splits is an ordered
    list of (name, fraction) summing to 1."""
    s = docs.sparkSession
    return _wrap(s, _api(s).leakSafeSplit(docs._jdf, id_col, pairs._jdf,
                                          [str(n) for n, _ in splits],
                                          [float(f) for _, f in splits],
                                          salt))


def hard_negatives_top_k(anchors, corpus, k=5):
    """Hard-negative mining: per anchor (qid, qvec, q_label), the top-k
    most cosine-similar corpus rows (id, vec, label) with a DIFFERENT
    label — contrastive-training negatives."""
    s = anchors.sparkSession
    return _wrap(s, _api(s).hardNegativesTopK(anchors._jdf, corpus._jdf,
                                              int(k)))


def mmr_select(corpus, query_vec, k=10, lambda_=0.7, n_candidates=200,
               id_col="id", vec_col="vec"):
    """MMR diversified top-k for one query vector (list of floats):
    (rank, id, rel, score) in greedy selection order — the dedup-aware
    retrieval step for RAG context building."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).mmrSelect(corpus._jdf,
                                      [float(x) for x in query_vec],
                                      int(k), float(lambda_),
                                      int(n_candidates), id_col, vec_col))


def image_dhash(media):
    """Perceptual hash table (media_id, dhash) from real BMP decode —
    the persistable index for image near-dup at corpus scale."""
    s = media.sparkSession
    return _wrap(s, _api(s).imageDHash(media._jdf))


def image_near_duplicates(media, max_dist=3, bands=4):
    """Image near-duplicate pairs (id_a, id_b, dist) by banded Hamming
    distance over dHash; complete for dist < bands by pigeonhole."""
    s = media.sparkSession
    return _wrap(s, _api(s).imageNearDuplicates(media._jdf, int(max_dist),
                                                int(bands)))


def pca_axis(corpus, vec_col="embedding", iters=10):
    """Top principal axis of an embedding column as (d, axis_q) — fixed-
    point power iteration, bit-identical at any partitioning."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).pcaAxis(corpus._jdf, vec_col, int(iters)))


def pca_label_projection(corpus, vec_col="embedding", label_col="label",
                         iters=10):
    """Per-label separation along the top principal component:
    (label, n, mean_proj_q, min_proj, max_proj)."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).pcaLabelProjection(corpus._jdf, vec_col,
                                               label_col, int(iters)))


def triangle_counts(edges):
    """Per-node triangle counts + local clustering coefficient as an exact
    integer rational: (node, n_triangles, deg, coeff_num, coeff_den).
    Degree-ordered orientation keeps the wedge join O(m^1.5)."""
    s = edges.sparkSession
    return _wrap(s, _api(s).triangleCounts(edges._jdf))


def association_rules(incidence, key_col, item_col, min_pair_support=2,
                      max_basket_size=10000):
    """Market-basket association rules with integer-exact metrics:
    (ante, cons, n_ab, n_ante, n_cons, n_baskets, conf_permille,
    lift_ppm). Baskets above max_basket_size distinct items are dropped
    (from pairs, supports and the denominator) with a logged count."""
    s = incidence.sparkSession
    return _wrap(s, _api(s).associationRules(incidence._jdf, key_col,
                                             item_col,
                                             int(min_pair_support),
                                             int(max_basket_size)))


def bpe_merges(docs, text_col="text", num_merges=10):
    """BPE tokenizer training over the corpus word histogram: the learned
    merge table (merge_rank, left_sym, right_sym, merged, n_pair) —
    deterministic (count desc, pair asc) tie-breaks, bit-identical at any
    partitioning."""
    s = docs.sparkSession
    return _wrap(s, _api(s).bpeMerges(docs._jdf, text_col, int(num_merges)))


def bpe_token_stats(docs, text_col="text", num_merges=10, top_k=40):
    """Post-training subword statistics: top_k final-vocabulary tokens by
    corpus occurrence (token, n_words, n_occurrences)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).bpeTokenStats(docs._jdf, text_col,
                                          int(num_merges), int(top_k)))


def bpe_encode_counts(docs, id_col="doc_id", text_col="text",
                      num_merges=10):
    """Encode every document with a freshly trained BPE tokenizer: per-doc
    (n_word_tokens, n_bpe_tokens, n_chars, chars_per_token_permille)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).bpeEncodeCounts(docs._jdf, id_col, text_col,
                                            int(num_merges)))


def histogram_sketch(df, group_col, value_col, lo_cents=0, hi_cents=50000,
                     bins=50):
    """Per-group equi-width histogram sketch (group, bin, n): constant
    mergeable state, integer-exact binning on cent-quantized values — the
    approx-quantile primitive when exact per-group sorts are too costly."""
    s = df.sparkSession
    return _wrap(s, _api(s).histogramSketch(df._jdf, group_col, value_col,
                                            int(lo_cents), int(hi_cents),
                                            int(bins)))


def histogram_percentiles(cells, group_col, ps_permille, lo_cents=0,
                          hi_cents=50000, bins=50):
    """Percentile estimates off histogram cells: (group, p_permille, bin,
    est_cents, n_total) — smallest bin reaching the cumulative target."""
    s = cells.sparkSession
    return _wrap(s, _api(s).histogramPercentiles(cells._jdf, group_col,
                                                 [int(p) for p in ps_permille],
                                                 int(lo_cents),
                                                 int(hi_cents), int(bins)))


def perceptron_train(feats, feature_cols, label_col="y", iters=24):
    """Pocket batch-perceptron over quantized-long features: deterministic
    integer training (mean-centered, best-accuracy snapshot kept).
    Returns (feature_idx, feature, center, weight, n_correct, n_total)."""
    s = feats.sparkSession
    return _wrap(s, _api(s).perceptronTrain(feats._jdf,
                                            [str(c) for c in feature_cols],
                                            label_col, int(iters)))


def apply_near_dedup_by(docs, id_col, pairs, score_col):
    """apply_near_dedup with a quality-aware representative: each duplicate
    cluster keeps its best row by (score desc, id asc)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).applyNearDedupBy(docs._jdf, id_col, pairs._jdf,
                                             score_col))


def content_defined_chunks(docs, id_col="doc_id", text_col="text",
                           window=8, mask_bits=6):
    """Content-defined chunking (rsync/FastCDC family): boundaries where
    the windowed fingerprint's low bits are zero, so edits shift only
    their own chunk. Returns (id, chunk_idx, chunk_pos, chunk_len,
    chunk); expected chunk length is 2**mask_bits chars."""
    s = docs.sparkSession
    return _wrap(s, _api(s).contentDefinedChunks(docs._jdf, id_col,
                                                 text_col, int(window),
                                                 int(mask_bits)))


def chunk_dedup_report(chunks):
    """One-row chunk-store dedup savings estimate: (n_chunks,
    n_distinct_chunks, n_dup_chunks, dup_chars, total_chars)."""
    s = chunks.sparkSession
    return _wrap(s, _api(s).chunkDedupReport(chunks._jdf))


def weighted_sample(df, key_col, weight_col, k, salt="graft"):
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential race): k rows with probability proportional to weight,
    deterministic across runs/retries/cluster sizes."""
    s = df.sparkSession
    return _wrap(s, _api(s).weightedSample(df._jdf, key_col, weight_col,
                                           int(k), salt))


def z_score_outliers(df, group_col, value_col, k_permille=3000):
    """Per-group k-sigma outlier counts via the exact 128-bit integer
    z-test (no floating point): (group, n_total, n_outliers)."""
    s = df.sparkSession
    return _wrap(s, _api(s).zScoreOutliers(df._jdf, group_col, value_col,
                                           int(k_permille)))


def link_breakends(variants):
    """Link VCF breakend (BND) records to mates by INFO MATEID or
    reciprocal coordinates: (id, referenceName, start, alt, mate_id,
    mate_referenceName, mate_start, via)."""
    s = variants.sparkSession
    return _wrap(s, _api(s).linkBreakends(variants._jdf))


def breakend_event_groups(variants):
    """Group structural-variant records by INFO EVENT: (event, n_records,
    n_breakends, referenceNames, min_start, max_start)."""
    s = variants.sparkSession
    return _wrap(s, _api(s).breakendEventGroups(variants._jdf))


def audio_fingerprint(media, windows=65):
    """Volume-invariant audio fingerprint table (media_id, afp) from real
    WAV decode — the audio analog of image_dhash."""
    s = media.sparkSession
    return _wrap(s, _api(s).audioFingerprint(media._jdf, int(windows)))


def audio_near_duplicates(media, max_dist=3, bands=4):
    """Audio near-duplicate pairs (id_a, id_b, dist) by banded Hamming
    distance over the energy-delta fingerprint."""
    s = media.sparkSession
    return _wrap(s, _api(s).audioNearDuplicates(media._jdf, int(max_dist),
                                                int(bands)))


def video_dhash(media):
    """Middle-frame perceptual hash table (media_id, vdhash) from real
    AVI decode."""
    s = media.sparkSession
    return _wrap(s, _api(s).videoDHash(media._jdf))


def video_near_duplicates(media, max_dist=3, bands=4):
    """Video near-duplicate pairs (id_a, id_b, dist) by banded Hamming
    distance over the middle-frame dHash."""
    s = media.sparkSession
    return _wrap(s, _api(s).videoNearDuplicates(media._jdf, int(max_dist),
                                                int(bands)))


def k_core(edges, rounds=4):
    """Fixed-round k-core peel at the data-derived median degree:
    (node, deg_residual, k_threshold)."""
    s = edges.sparkSession
    return _wrap(s, _api(s).kCoreByMedianDegree(edges._jdf, int(rounds)))


def read_warc(spark, path_glob):
    """Distributed WARC (Common Crawl) read: one task per archive file,
    records streamed with constant memory; gzip-per-record detected."""
    return _wrap(spark, _api(spark).readWarc(spark._jsparkSession,
                                             path_glob))


def warc_responses(warc):
    """HTTP response records with the envelope stripped:
    (target_uri, warc_date, html, src_file)."""
    s = warc.sparkSession
    return _wrap(s, _api(s).warcResponses(warc._jdf))


def warc_conversions(warc):
    """WET-shape conversion records decoded as UTF-8 text:
    (target_uri, warc_date, text, src_file)."""
    s = warc.sparkSession
    return _wrap(s, _api(s).warcConversions(warc._jdf))


def hamming_near_duplicates_against(index, probes, id_col="media_id",
                                    hash_col="dhash", max_dist=3, bands=4):
    """Probe a persisted perceptual-hash index (image/audio/video) with a
    batch of probe hashes: (probe_id, corpus_id, dist)."""
    s = index.sparkSession
    return _wrap(s, _api(s).hammingNearDuplicatesAgainst(
        index._jdf, probes._jdf, id_col, hash_col, int(max_dist),
        int(bands)))


def hll_summary_by_group(docs, group_col="source", text_col="text", p=10):
    """Per-group HLL distinct-token summaries — the deterministic,
    oracle-exact analog of approx_count_distinct(...) GROUP BY."""
    s = docs.sparkSession
    return _wrap(s, _api(s).hllSummaryByGroup(docs._jdf, group_col,
                                              text_col, int(p)))


def apply_near_dedup(docs, id_col, pairs):
    """Terminal near-dedup step: cluster duplicate pairs (exact connected
    components), keep the min-id representative per cluster, return the
    surviving corpus. Composes with any pair source (MinHash, SimHash,
    embedding-cosine, edit-distance, dHash)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).applyNearDedup(docs._jdf, id_col, pairs._jdf))


def correlation_matrix(df, cols, scales):
    """Exact pairwise Pearson correlations over quantized columns:
    (col_a, col_b, n, sxy, sxx, syy, corr) — integer centered sums, so
    the double corr is bit-identical across engines and partitionings."""
    s = df.sparkSession
    return _wrap(s, _api(s).correlationMatrix(df._jdf, list(cols),
                                              [int(x) for x in scales]))


def interval_join(left, right, key_col, ts_col, max_gap="30 minutes",
                  watermark_delay="10 minutes"):
    """Stream-stream (or batch) interval join with dual watermarks — the
    ad-attribution shape; state bounded by key-rate x max_gap. Columns
    come back prefixed l_/r_."""
    s = left.sparkSession
    return _wrap(s, _api(s).intervalJoin(left._jdf, right._jdf, key_col,
                                         ts_col, max_gap, watermark_delay))


def snapshot_delta(old, new, id_col="doc_id", text_col="text",
                   carry_cols=()):
    """Incremental corpus diff between two snapshots: per-doc status
    added|deleted|changed|unchanged via constant-width fingerprints."""
    s = old.sparkSession
    return _wrap(s, _api(s).snapshotDelta(old._jdf, new._jdf, id_col,
                                          text_col, list(carry_cols)))


def snapshot_delta_report(delta, group_cols):
    """The delta rolled up per group: (group_cols*, n_added, n_deleted,
    n_changed, n_unchanged)."""
    s = delta.sparkSession
    return _wrap(s, _api(s).snapshotDeltaReport(delta._jdf,
                                                list(group_cols)))


def budget_select(docs, id_col, score_col, tokens_col, budget):
    """Token-budget selection: the (score DESC, id) greedy prefix under a
    global token budget, via the two-phase distributed cumulative sum.
    (id, score, tokens, cum_tokens, selected)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).budgetSelect(docs._jdf, id_col, score_col,
                                         tokens_col, int(budget)))


def calibrated_select(docs, strata_col, id_col, score_col,
                      keep_fraction=0.3):
    """Per-stratum percentile calibration + top-fraction selection —
    domain-balanced quality filtering. (strata, id, score, calibrated,
    selected)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).calibratedSelect(docs._jdf, strata_col, id_col,
                                             score_col,
                                             float(keep_fraction)))


def next_event_examples(events, key_col="user_id", type_col="event_type",
                        ts_col="ts", tie_break="event_id", history_len=3):
    """Bounded-history next-event training examples: ('>'-joined history
    of up to history_len prior types, label) per event."""
    s = events.sparkSession
    return _wrap(s, _api(s).nextEventExamples(events._jdf, key_col,
                                              type_col, ts_col, tie_break,
                                              int(history_len)))


def salted_join(left, right, using_keys, salt_key_col, salts=8,
                join_type="inner"):
    """Explicit salted skew join — result equals the plain equi-join; the
    left side is salted on salt_key_col, the right replicated per salt."""
    s = left.sparkSession
    return _wrap(s, _api(s).saltedJoin(left._jdf, right._jdf,
                                       [str(k) for k in using_keys],
                                       salt_key_col, int(salts), join_type))


def global_ntile(df, value_col, tie_break, n):
    """Exact global equal-depth binning (ANSI NTILE(n) semantics) without
    a single-partition sort: input columns + 1-based `bucket`."""
    s = df.sparkSession
    return _wrap(s, _api(s).globalNtile(df._jdf, value_col, tie_break,
                                        int(n)))


def key_skew_report(df, key_col, k=20):
    """Key-skew profile: top-k heaviest keys with count, share and global
    (rows, distinct-keys) totals — the measure-before-you-salt diagnostic."""
    s = df.sparkSession
    return _wrap(s, _api(s).keySkewReport(df._jdf, key_col, int(k)))


def source_novelty(docs, text_col="text", source_col="source"):
    """Per-source novelty attribution after exact dedup (alphabetical
    ingestion order): (source, n_docs, n_distinct, n_novel, novelty_rate)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).sourceNovelty(docs._jdf, text_col, source_col))


def source_similarity(docs, text_col="text", source_col="source",
                      buckets=4096):
    """Pairwise source cosine over hashed unigram count vectors:
    (src_a, src_b, n_shared_buckets, cosine)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).sourceSimilarity(docs._jdf, text_col,
                                             source_col, int(buckets)))


def chi_square_features(docs, label_col="source", text_col="text",
                        buckets=4096, k=50):
    """Top-k label-discriminative hashed token buckets by exact quantized
    chi-square: (b, chi2_q)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).chiSquareFeatures(docs._jdf, label_col,
                                              text_col, int(buckets),
                                              int(k)))


def rrf_fuse(a, b, id_col="doc_id", rank_col="rank", k=60, top_n=100):
    """Reciprocal-rank fusion of two (id, rank) rankings — integer-exact
    1e12 div (k+rank) quanta: (id, rrf_q, rank_a, rank_b)."""
    s = a.sparkSession
    return _wrap(s, _api(s).rrfFuse(a._jdf, b._jdf, id_col, rank_col,
                                    int(k), int(top_n)))


def gini_by_group(df, group_col, value_col, tie_break):
    """Per-group Gini concentration of a long value column:
    (group, n_docs, total, gini)."""
    s = df.sparkSession
    return _wrap(s, _api(s).giniByGroup(df._jdf, group_col, value_col,
                                        tie_break))


def k_anonymity_report(df, quasi_cols, k=10):
    """k-anonymity release audit over quasi-identifier columns: one row
    (n_rows, n_classes, min_class_size, n_small_classes, n_rows_at_risk,
    risk_rate)."""
    s = df.sparkSession
    return _wrap(s, _api(s).kAnonymityReport(
        df._jdf, [str(c) for c in quasi_cols], int(k)))


def trend_by_group(df, group_col, x_col, y_col):
    """Per-group exact least-squares trend: (group, n_points, slope,
    intercept); degenerate x spreads report nulls."""
    s = df.sparkSession
    return _wrap(s, _api(s).trendByGroup(df._jdf, group_col, x_col, y_col))


def wilson_ranking(df, group_col, pass_col, z=1.96):
    """Per-group Wilson score lower bound on a boolean pass rate:
    (group, n_docs, n_pass, wilson_lb)."""
    s = df.sparkSession
    return _wrap(s, _api(s).wilsonRanking(df._jdf, group_col, pass_col,
                                          float(z)))


def profile_columns(df, cols):
    """Single-pass table profile: one row per column with
    (col_name, n_rows, n_nulls, n_distinct, n_blank)."""
    s = df.sparkSession
    return _wrap(s, _api(s).profileColumns(df._jdf,
                                           [str(c) for c in cols]))


def fk_audit(child, parent, child_key, parent_key):
    """Referential-integrity audit: (n_child_rows, n_orphans,
    orphan_rate); null child keys count as orphans."""
    s = child.sparkSession
    return _wrap(s, _api(s).fkAudit(child._jdf, parent._jdf, child_key,
                                    parent_key))


def pk_audit(df, key_cols):
    """Primary-key uniqueness audit: (n_rows, n_keys, n_dup_keys,
    n_dup_rows, dup_rate)."""
    s = df.sparkSession
    return _wrap(s, _api(s).pkAudit(df._jdf, [str(c) for c in key_cols]))


def calibration_curve(df, score_col, outcome_col, tie_break, n=10):
    """Reliability diagram over exact equal-depth score buckets:
    (bucket, n, n_pos, pos_rate)."""
    s = df.sparkSession
    return _wrap(s, _api(s).calibrationCurve(df._jdf, score_col,
                                             outcome_col, tie_break,
                                             int(n)))


def rolling_distinct_actives(events, key_col="user_id", ts_col="ts",
                             window_days=7):
    """Daily + rolling exact distinct actives (DAU/WAU):
    (day, dau, rolling)."""
    s = events.sparkSession
    return _wrap(s, _api(s).rollingDistinctActives(events._jdf, key_col,
                                                   ts_col,
                                                   int(window_days)))


def volume_anomalies(daily, group_col, day_col, count_col, lookback=7,
                     min_history=4, k_permille=3000):
    """Trailing-window exact z-test anomaly flags over per-group daily
    counts: input columns + `anomalous`."""
    s = daily.sparkSession
    return _wrap(s, _api(s).volumeAnomalies(
        daily._jdf, group_col, day_col, count_col, int(lookback),
        int(min_history), int(k_permille)))


def retention_cohorts(events, key_col="user_id", ts_col="ts"):
    """Retention triangle: (cohort_day, age_days, n_active)."""
    s = events.sparkSession
    return _wrap(s, _api(s).retentionCohorts(events._jdf, key_col, ts_col))


def calendar_fill(daily, group_col, day_col, value_col):
    """Calendar gap fill + forward fill on a keyed daily series:
    (group, day, value, observed)."""
    s = daily.sparkSession
    return _wrap(s, _api(s).calendarFill(daily._jdf, group_col, day_col,
                                         value_col))


def ab_test_report(units, group_col, variant_col, outcome_col):
    """Pooled two-proportion A/B z-test per experiment group."""
    s = units.sparkSession
    return _wrap(s, _api(s).abTestReport(units._jdf, group_col,
                                         variant_col, outcome_col))


def remove_boilerplate(docs, id_col="doc_id", text_col="text",
                       group_col="source", min_docs=3):
    """Domain-scoped boilerplate removal: every occurrence of a paragraph
    seen in >= min_docs docs of the SAME group is removed; returns the
    rewritten docs plus per-doc removal accounting."""
    s = docs.sparkSession
    return _wrap(s, _api(s).removeBoilerplate(docs._jdf, id_col, text_col,
                                              group_col, int(min_docs)))


def water_fill_allocation(counts, source_col, avail_col, weight_col,
                          budget):
    """Budget-constrained water-filling mixture allocation:
    (source, available, weight, capped, allocated)."""
    s = counts.sparkSession
    return _wrap(s, _api(s).waterFillAllocation(
        counts._jdf, source_col, avail_col, weight_col, int(budget)))


def water_fill_allocation_fraction(counts, source_col, avail_col,
                                   weight_col, budget_num, budget_den):
    """Water-filling with budget = floor(sum(avail) * num / den) folded
    into the plan (no driver-side sum)."""
    s = counts.sparkSession
    return _wrap(s, _api(s).waterFillAllocationFraction(
        counts._jdf, source_col, avail_col, weight_col, int(budget_num),
        int(budget_den)))


def balanced_shards(df, size_col, tie_break, n_shards):
    """Deterministic size-balanced serpentine shard assignment: input
    columns + shard (0-based)."""
    s = df.sparkSession
    return _wrap(s, _api(s).balancedShards(df._jdf, size_col, tie_break,
                                           int(n_shards)))


def shard_report(df, size_col, tie_break, n_shards):
    """Per-shard balance report: (shard, n_items, total_size)."""
    s = df.sparkSession
    return _wrap(s, _api(s).shardReport(df._jdf, size_col, tie_break,
                                        int(n_shards)))


def modularity(edges, labels):
    """Newman modularity of a labeled partition over (src, dst) edges:
    one row (m, n_within, q_modularity)."""
    s = edges.sparkSession
    return _wrap(s, _api(s).modularity(edges._jdf, labels._jdf))


def inter_arrival_stats(events, key_col="user_id", ts_col="ts",
                        id_col="event_id", group_col="event_type"):
    """Per-group inter-arrival gap profile (exact disc percentiles of
    consecutive-event gaps in ms): (group, n, p50, p90, p99)."""
    s = events.sparkSession
    return _wrap(s, _api(s).interArrivalStats(events._jdf, key_col,
                                              ts_col, id_col, group_col))


def winsorize_report(df, group_col, value_col, tie_break):
    """Winsorization audit: per group, exact disc p1/p99 cuts and the
    integer clamp bookkeeping."""
    s = df.sparkSession
    return _wrap(s, _api(s).winsorizeReport(df._jdf, group_col, value_col,
                                            tie_break))


def dyadic_trailing_mean(daily, group_col, day_col, value_col, window=8):
    """Dyadic recency-weighted trailing mean over keyed daily series:
    input columns + (num, den, smoothed)."""
    s = daily.sparkSession
    return _wrap(s, _api(s).dyadicTrailingMean(daily._jdf, group_col,
                                               day_col, value_col,
                                               int(window)))


def assortativity(edges):
    """Degree assortativity over (src, dst) edges: one row
    (m, r_assortativity); r is NULL on regular graphs."""
    s = edges.sparkSession
    return _wrap(s, _api(s).assortativity(edges._jdf))


def first_touch_attribution(events, key_col="user_id",
                            type_col="event_type", ts_col="ts",
                            id_col="event_id", touch_type="view",
                            conv_type="purchase", window_ms=86400000):
    """First-touch attribution within a trailing ms window:
    (key, id, conv_ms, first_touch_ms, gap_ms)."""
    s = events.sparkSession
    return _wrap(s, _api(s).firstTouchAttribution(
        events._jdf, key_col, type_col, ts_col, id_col, touch_type,
        conv_type, int(window_ms)))


def merge_clusters(labels, new_pairs):
    """Incremental connected-component maintenance: merge an existing
    (id, cluster_id) labeling with new duplicate pairs."""
    s = labels.sparkSession
    return _wrap(s, _api(s).mergeClusters(labels._jdf, new_pairs._jdf))


def psi_report(df, side_col, bucket_col):
    """PSI drift report (side_col true = current slice):
    (b, n_ref, n_cur, psi_q); total PSI = sum(psi_q)/1e7."""
    s = df.sparkSession
    return _wrap(s, _api(s).psiReport(df._jdf, side_col, bucket_col))


def psi_from_counts(ref, cur):
    """PSI from pre-aggregated (b, n_ref) x (b, n_cur) count tables."""
    s = ref.sparkSession
    return _wrap(s, _api(s).psiFromCounts(ref._jdf, cur._jdf))


def capped_top_k(df, score_col, group_col, tie_break, k, per_group_cap):
    """Global top-k under a per-group cap (diversity-quota selection)."""
    s = df.sparkSession
    return _wrap(s, _api(s).cappedTopK(df._jdf, score_col, group_col,
                                       tie_break, int(k),
                                       int(per_group_cap)))


def mad_outliers(df, group_col, value_col, tie_break, k_permille=3500):
    """MAD robust outlier flags (pure integer decision path):
    input columns + (med, mad, is_out)."""
    s = df.sparkSession
    return _wrap(s, _api(s).madOutliers(df._jdf, group_col, value_col,
                                        tie_break, int(k_permille)))


def percent_rank_normalize(df, group_col, score_col):
    """Per-group percent-rank score normalization: input columns +
    pct_rank in [0, 1] ((rank-1)/(n-1), RANK tie semantics)."""
    s = df.sparkSession
    return _wrap(s, _api(s).percentRankNormalize(df._jdf, group_col,
                                                 score_col))


def horizon_dedup(df, key_col, ts_col, tie_break, horizon_ms):
    """Horizon (recrawl) dedup by key — chained gap semantics, the batch
    twin of streaming dropDuplicatesWithinWatermark state expiry: input
    columns + (fresh, epoch)."""
    s = df.sparkSession
    return _wrap(s, _api(s).horizonDedup(df._jdf, key_col, ts_col,
                                         tie_break, int(horizon_ms)))


def horizon_dedup_text(docs, text_col, ts_col, tie_break, horizon_ms):
    """Horizon dedup keyed by the normalized-text md5 fingerprint (same
    normalization as the streaming dedup twin); adds the fp column."""
    s = docs.sparkSession
    return _wrap(s, _api(s).horizonDedupText(docs._jdf, text_col, ts_col,
                                             tie_break, int(horizon_ms)))


def hash_sample_n(df, group_col, id_col, n):
    """Deterministic fixed-size per-group sample: exactly min(n, |group|)
    rows per group by md5(id) rank — stable across runs/partitioning."""
    s = df.sparkSession
    return _wrap(s, _api(s).hashSampleN(df._jdf, group_col, id_col,
                                        int(n)))


def padding_waste_report(docs, len_col, capacities):
    """Padding-waste audit for length-bucketed batching: one row per
    capacity bucket (capacity, n_docs, sum_len, padded_units,
    truncated_units, waste_permille)."""
    s = docs.sparkSession
    gw = s.sparkContext._gateway
    arr = gw.new_array(gw.jvm.long, len(capacities))
    for i, c in enumerate(capacities):
        arr[i] = int(c)
    return _wrap(s, _api(s).paddingWasteReport(docs._jdf, len_col, arr))


def neyman_allocation(df, stratum_col, value_col, budget):
    """Neyman (optimal) stratified-sampling allocation — budget split
    proportionally to N_h*sigma_h, exact integer largest-remainder:
    (stratum, n_rows, weight_q, alloc)."""
    s = df.sparkSession
    return _wrap(s, _api(s).neymanAllocation(df._jdf, stratum_col,
                                             value_col, int(budget)))


def source_overlap_exact(docs, text_col, source_col):
    """Exact pairwise cross-source duplication matrix over normalized-text
    fingerprints: (src_a, src_b, n_a, n_b, n_shared, jaccard_permille),
    zero-overlap pairs included."""
    s = docs.sparkSession
    return _wrap(s, _api(s).sourceOverlapExact(docs._jdf, text_col,
                                               source_col))


def oov_rate(docs, text_col, source_col, vocab, vocab_col):
    """Occurrence-weighted out-of-vocabulary rate per source against a
    supplied vocabulary DataFrame: (source, n_tokens, oov_tokens,
    oov_permille)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).oovRate(docs._jdf, text_col, source_col,
                                    vocab._jdf, vocab_col))


def filter_waterfall(df, rules):
    """Filter-impact waterfall over an ORDERED list of (name, sql_expr)
    keep-rules: per rule (rule_order, rule, n_fail, n_first_fail,
    n_surviving)."""
    s = df.sparkSession
    gw = s.sparkContext._gateway
    names = gw.new_array(gw.jvm.java.lang.String, len(rules))
    exprs = gw.new_array(gw.jvm.java.lang.String, len(rules))
    for i, (n, e) in enumerate(rules):
        names[i] = n
        exprs[i] = e
    return _wrap(s, _api(s).filterWaterfall(df._jdf, names, exprs))


def hits(edges, iters=3):
    """Integer HITS hub/authority scores over directed edges (src, dst):
    (node, side 'hub'|'auth', score_q) — engine-replayable integer
    renormalized iterations."""
    s = edges.sparkSession
    return _wrap(s, _api(s).hits(edges._jdf, int(iters)))


def hits_top_k(edges, iters, k):
    """Top-k hubs and top-k authorities of hits() with the deterministic
    (score desc, node) tie-break."""
    s = edges.sparkSession
    return _wrap(s, _api(s).hitsTopK(edges._jdf, int(iters), int(k)))


def rfm_scores(events, key_col, ts_col, value_col, tiers=5):
    """RFM (recency/frequency/monetary) tier scoring per key: (key,
    last_ts_ms, n_events, monetary_cents, r_score, f_score, m_score,
    rfm)."""
    s = events.sparkSession
    return _wrap(s, _api(s).rfmScores(events._jdf, key_col, ts_col,
                                      value_col, int(tiers)))


def nearest_centroid_eval(corpus, label_col, vec_col="embedding"):
    """Nearest-centroid label confusion over an embedding table —
    (label, predicted, n); off-diagonal mass = entangled/mislabeled.
    Labels must be integral ids."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).nearestCentroidEval(corpus._jdf, label_col,
                                                vec_col))


def burst_activity_report(events, key_col, ts_col, bucket_ms,
                          burst_threshold):
    """Fixed-bucket burst-activity (bot-likelihood) report:
    (key, n_events, max_per_bucket, is_burst)."""
    s = events.sparkSession
    return _wrap(s, _api(s).burstActivityReport(events._jdf, key_col,
                                                ts_col, int(bucket_ms),
                                                int(burst_threshold)))


def profile_drift(a, cols_a, b, cols_b):
    """Snapshot-to-snapshot per-column profile drift: status
    added/removed/common + exact null-rate permille and cardinality
    deltas."""
    s = a.sparkSession
    gw = s.sparkContext._gateway

    def _sarr(xs):
        arr = gw.new_array(gw.jvm.java.lang.String, len(xs))
        for i, x in enumerate(xs):
            arr[i] = x
        return arr
    return _wrap(s, _api(s).profileDrift(a._jdf, _sarr(cols_a), b._jdf,
                                         _sarr(cols_b)))


def fd_violations(df, det_col, dep_col, k=20):
    """Functional-dependency violation audit: top-k determinant values of
    det_col mapped to >1 distinct dep_col value — (det, n_rows,
    n_distinct_dep), worst-first."""
    s = df.sparkSession
    return _wrap(s, _api(s).fdViolations(df._jdf, det_col, dep_col,
                                         int(k)))


def event_path_trigrams(events, key_col, type_col, ts_col, tie_break,
                        k=20):
    """Top-k consecutive event-type trigram paths — (t1, t2, t3,
    n_paths), the funnel-discovery step up from the transition matrix."""
    s = events.sparkSession
    return _wrap(s, _api(s).eventPathTrigrams(events._jdf, key_col,
                                              type_col, ts_col, tie_break,
                                              int(k)))


def source_centroid_drift(corpus, group_col, vec_col="embedding"):
    """Per-group embedding-centroid cosine vs the global centroid —
    (group, n_vecs, cosine_to_global); low values flag distribution
    shift."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).sourceCentroidDrift(corpus._jdf, group_col,
                                                vec_col))


def corpus_growth_curve(docs, text_col="text", day_col="day"):
    """Corpus growth curve: per epoch (day, n_sightings, n_distinct,
    n_new, cum_distinct) over exact-dedup fingerprints."""
    s = docs.sparkSession
    return _wrap(s, _api(s).corpusGrowthCurve(docs._jdf, text_col,
                                              day_col))


def link_domain_edges(docs, src_domain_col, html_col, id_col="doc_id"):
    """Domain-level link graph from crawled HTML — (src_domain,
    dst_domain, n_links, n_docs); absolute http(s) hrefs only."""
    s = docs.sparkSession
    return _wrap(s, _api(s).linkDomainEdges(docs._jdf, src_domain_col,
                                            html_col, id_col))


def top_linked_domains(edges, k=10):
    """The k most-linked destination domains of a link graph."""
    s = edges.sparkSession
    return _wrap(s, _api(s).topLinkedDomains(edges._jdf, int(k)))


def rendezvous_move_report(df, key_col, from_shards, to_shards):
    """Rendezvous-shard resize audit: one row (n_keys, n_moved,
    moved_permille) — only keys whose new shards win move (~(m-n)/m on
    grow), unlike a pmod reshuffle."""
    s = df.sparkSession
    return _wrap(s, _api(s).rendezvousMoveReport(df._jdf, key_col,
                                                 int(from_shards),
                                                 int(to_shards)))


def ks_drift(df, side_col, value_col):
    """Two-sample KS drift statistic between side=False (reference) and
    side=True (current) over an integer value column: one row
    (n_ref, n_cur, ks_at, ks_d)."""
    s = df.sparkSession
    return _wrap(s, _api(s).ksDrift(df._jdf, side_col, value_col))


def mutual_information_report(df, col_a, col_b):
    """Mutual information / NMI between two categorical columns: one row
    (n, n_cells, mi_nats, h_a, h_b, nmi)."""
    s = df.sparkSession
    return _wrap(s, _api(s).mutualInformationReport(df._jdf, col_a, col_b))


def cohen_kappa(df, col_a, col_b):
    """Cohen's kappa inter-rater agreement between two label columns:
    one row (n, n_agree, kappa)."""
    s = df.sparkSession
    return _wrap(s, _api(s).cohenKappa(df._jdf, col_a, col_b))


def benford_audit(df, group_col, value_col):
    """Benford first-digit audit of a positive integer column per group:
    (group, n, n_skipped, d1..d9, chi2)."""
    s = df.sparkSession
    return _wrap(s, _api(s).benfordAudit(df._jdf, group_col, value_col))


def simplified_silhouette(corpus, label_col="label", vec="embedding"):
    """Simplified (centroid) silhouette per label:
    (label, n_vecs, mean_silhouette)."""
    s = corpus.sparkSession
    return _wrap(s, _api(s).simplifiedSilhouette(corpus._jdf, label_col,
                                                 vec))


def cusum_changepoint(events, key_col, ts_col="ts", bucket_ms=86400000):
    """CUSUM level-shift changepoint per key over bucketed volumes:
    (key, n_buckets, total, cp_bucket, cusum_peak, cusum_permille)."""
    s = events.sparkSession
    return _wrap(s, _api(s).cusumChangepoint(events._jdf, key_col, ts_col,
                                             int(bucket_ms)))


def auc_by_group(df, group_col, score_col, label_col):
    """Per-group ROC AUC (Mann-Whitney rank identity, exact midrank
    ties): (group, n_pos, n_neg, auc)."""
    s = df.sparkSession
    return _wrap(s, _api(s).aucByGroup(df._jdf, group_col, score_col,
                                       label_col))


def entropy_by_group(df, group_col, value_col):
    """Shannon entropy (nats) of the value distribution within each
    group: (group, n, n_distinct, entropy_nats)."""
    s = df.sparkSession
    return _wrap(s, _api(s).entropyByGroup(df._jdf, group_col, value_col))


def flesch_readability(docs, id_col="doc_id", text_col="text"):
    """Flesch reading-ease per document:
    (id, n_words, n_sentences, n_syllables, flesch)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).fleschReadability(docs._jdf, id_col, text_col))


def autocorr_by_key(events, key_col, ts_col="ts", bucket_ms=86400000,
                    lag_k=7):
    """Lag-k autocorrelation of bucketed volumes per key:
    (key, n_pairs, acf)."""
    s = events.sparkSession
    return _wrap(s, _api(s).autocorrByKey(events._jdf, key_col, ts_col,
                                          int(bucket_ms), int(lag_k)))


def personalized_pagerank(edges, seeds, iters=5, k=None):
    """Personalized PageRank from a seed node set: (node, rank_q);
    pass k for the deterministic top-k cut."""
    s = edges.sparkSession
    if k is None:
        return _wrap(s, _api(s).personalizedPageRank(edges._jdf,
                                                     seeds._jdf,
                                                     int(iters)))
    return _wrap(s, _api(s).personalizedPageRankTopK(edges._jdf,
                                                     seeds._jdf,
                                                     int(iters), int(k)))


def hapax_stats(docs, text_col="text", source_col="source"):
    """Lexical-richness profile per source:
    (source, n_tokens, n_types, n_hapax, ttr, hapax_ratio)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).hapaxStats(docs._jdf, text_col, source_col))


def ranked_eval(df, query_col, rank_col, rel_col, k=10):
    """Ranked-retrieval eval per query (P@k, MRR, NDCG@k with an
    integer discount table): (query, n_rel, rel_at_k, p_at_k, mrr,
    ndcg)."""
    s = df.sparkSession
    return _wrap(s, _api(s).rankedEval(df._jdf, query_col, rank_col,
                                       rel_col, int(k)))


def target_encode(df, cat_col, value_col, prior_weight=20):
    """Smoothed target encoding of a categorical column:
    (cat, n, sum_cents, encoded)."""
    s = df.sparkSession
    return _wrap(s, _api(s).targetEncode(df._jdf, cat_col, value_col,
                                         int(prior_weight)))


def json_key_profile(df, json_col):
    """JSON key discovery over a semi-structured column: per key,
    presence, cardinality, and a value-type census; malformed rows in
    n_bad."""
    s = df.sparkSession
    return _wrap(s, _api(s).jsonKeyProfile(df._jdf, json_col))


def moments_by_group(df, group_col, value_col):
    """Distribution-shape census per group:
    (group, n, mean, variance, skewness, kurtosis)."""
    s = df.sparkSession
    return _wrap(s, _api(s).momentsByGroup(df._jdf, group_col, value_col))


def robust_scale(df, group_col, value_col, tie_break):
    """Robust (median/IQR) scaling within each group: input columns +
    (med, iqr, robust_scaled)."""
    s = df.sparkSession
    return _wrap(s, _api(s).robustScale(df._jdf, group_col, value_col,
                                        tie_break))


def skip_gram_pairs(docs, id_col="doc_id", text_col="text", window=2,
                    min_count=5):
    """Skip-gram co-occurrence counts for embedding training:
    (center, context, n_pairs)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).skipGramPairs(docs._jdf, id_col, text_col,
                                          int(window), int(min_count)))


def join_size_probe(a, key_a, b, key_b):
    """Exact pre-join cardinality probe — join_rows and the worst key's
    fanout WITHOUT materializing the join: one row (n_keys_a, n_keys_b,
    n_keys_common, rows_a, rows_b, join_rows, max_key_rows)."""
    s = a.sparkSession
    return _wrap(s, _api(s).joinSizeProbe(a._jdf, key_a, b._jdf, key_b))


def transition_latency(events, key_col, type_col, ts_col="ts",
                       id_col="event_id"):
    """Per-transition (prev->cur) latency percentiles:
    (transition, n, p50, p90, p99) in milliseconds."""
    s = events.sparkSession
    return _wrap(s, _api(s).transitionLatency(events._jdf, key_col,
                                              type_col, ts_col, id_col))


def pii_census(docs, text_col="text", source_col="source"):
    """Per-source PII risk census: (source, n_docs, n_docs_with_pii,
    pii_permille, n_emails, n_ips, n_phones)."""
    s = docs.sparkSession
    return _wrap(s, _api(s).piiCensus(docs._jdf, text_col, source_col))


def temporal_split_audit(df, split_col, ts_col, order):
    """Temporal split leakage audit per consecutive boundary; order is
    a list of split labels, earliest first."""
    s = df.sparkSession
    return _wrap(s, _api(s).temporalSplitAudit(df._jdf, split_col,
                                               ts_col, ",".join(order)))


def numeric_profile(df, cols):
    """Single-scan numeric profile of integer (cents) columns:
    (col_name, n_rows, n_nulls, min_v, max_v, sum_v, mean_v,
    variance_v) — mean/variance as exact integer floors."""
    s = df.sparkSession
    return _wrap(s, _api(s).numericProfile(df._jdf, ",".join(cols)))


def column_drift(a, b, cols, buckets=64):
    """Per-column value-distribution drift (PSI over fnv1a64 hash
    buckets) between two snapshots: (col_name, n_ref, n_cur, psi)."""
    s = a.sparkSession
    return _wrap(s, _api(s).columnDrift(a._jdf, b._jdf, ",".join(cols),
                                        int(buckets)))


def vocab_coverage(docs, text_col="text", ks=(1000, 10000, 50000)):
    """Vocabulary coverage curve: token-mass share of the top-k types
    at each ascending k — the tokenizer vocab-sizing report."""
    s = docs.sparkSession
    return _wrap(s, _api(s).vocabCoverage(docs._jdf, text_col,
                                          ",".join(str(k) for k in ks)))


def tstv_ratio(variants, group_col, ref_col="referenceAllele",
               alt_col="alternateAllele"):
    """Transition/transversion census per group (SNVs only):
    (group, n_snv, n_ts, n_tv, tstv)."""
    s = variants.sparkSession
    return _wrap(s, _api(s).tstvRatio(variants._jdf, group_col, ref_col,
                                      alt_col))


def hardy_weinberg(genotypes, site_col, gt_class_col):
    """Hardy-Weinberg chi-square per site from 0/1/2 genotype classes:
    (site, n, n_hom_ref, n_het, n_hom_alt, maf, chi2)."""
    s = genotypes.sparkSession
    return _wrap(s, _api(s).hardyWeinberg(genotypes._jdf, site_col,
                                          gt_class_col))


def genotype_concordance(a, b, keys, class_col):
    """Genotype-concordance confusion grid between two callsets:
    (class_a, class_b, n); classes missing on a side count MISSING."""
    s = a.sparkSession
    return _wrap(s, _api(s).genotypeConcordance(a._jdf, b._jdf,
                                                ",".join(keys), class_col))


def allele_frequency_spectrum(variants, ac_col, an_col, bins=20):
    """Allele-frequency spectrum histogram: (bin, n_sites)."""
    s = variants.sparkSession
    return _wrap(s, _api(s).alleleFrequencySpectrum(variants._jdf, ac_col,
                                                    an_col, int(bins)))


def coverage_uniformity(coverage):
    """Coverage-evenness census per contig: (referenceName, bases,
    mean_depth, within_band_permille)."""
    s = coverage.sparkSession
    return _wrap(s, _api(s).coverageUniformity(coverage._jdf))


def mendelian_violations(trios, father_col, mother_col, child_col):
    """Mendelian-consistency grid over trio genotype classes:
    (father_gt, mother_gt, child_gt, violation, n)."""
    s = trios.sparkSession
    return _wrap(s, _api(s).mendelianViolations(trios._jdf, father_col,
                                                mother_col, child_col))


def fleiss_kappa(df, item_col, label_col):
    """Fleiss' kappa for N raters per item (one row per rating):
    (n_items, n_raters, n_categories, p_bar, p_e, kappa)."""
    s = df.sparkSession
    return _wrap(s, _api(s).fleissKappa(df._jdf, item_col, label_col))


def bootstrap_ci(df, group_col, value_col, id_col, b=32):
    """Deterministic Poisson-bootstrap CI of the per-group mean:
    (group, n, mean, boot_lo, boot_hi, n_boot)."""
    s = df.sparkSession
    return _wrap(s, _api(s).bootstrapCi(df._jdf, group_col, value_col,
                                        id_col, int(b)))


def seasonal_profile(df, key_col, ts_col="ts"):
    """Weekly (dow, hour) seasonality profile per key:
    (key, dow, hour, n, key_total, slot_total, ratio_permille)."""
    s = df.sparkSession
    return _wrap(s, _api(s).seasonalProfile(df._jdf, key_col, ts_col))


def king_kinship(genotypes, sample_col, site_col, gt_col,
                 max_samples=1000):
    """Pairwise KING-robust kinship over a bounded cohort: (sample_i,
    sample_j, n_shared, n_both_het, n_opp_hom, n_het_i, n_het_j,
    kinship)."""
    s = genotypes.sparkSession
    return _wrap(s, _api(s).kingKinship(genotypes._jdf, sample_col,
                                        site_col, gt_col,
                                        int(max_samples)))


def inbreeding_f(genotypes, sample_col, site_col, gt_col):
    """Per-sample inbreeding coefficient F vs cohort allele
    frequencies: (sample, n_called, n_het, exp_het, f)."""
    s = genotypes.sparkSession
    return _wrap(s, _api(s).inbreedingF(genotypes._jdf, sample_col,
                                        site_col, gt_col))


def substitution_matrix(variants, ref_col="referenceAllele",
                        alt_col="alternateAllele"):
    """12-class SNV substitution census: (ref_allele, alt_allele, n,
    permille)."""
    s = variants.sparkSession
    return _wrap(s, _api(s).substitutionMatrix(variants._jdf, ref_col,
                                               alt_col))


def indel_length_spectrum(variants, ref_col="referenceAllele",
                          alt_col="alternateAllele", max_abs_len=20):
    """Indel length spectrum with edge-bin clamping:
    (dlen, n_indels)."""
    s = variants.sparkSession
    return _wrap(s, _api(s).indelLengthSpectrum(variants._jdf, ref_col,
                                                alt_col,
                                                int(max_abs_len)))


def call_rate(genotypes, sample_col, gt_col):
    """Per-sample call-rate / genotype-class census: (sample, n_total,
    n_called, n_het, n_hom_ref, n_hom_alt, n_other,
    call_rate_permille, het_permille)."""
    s = genotypes.sparkSession
    return _wrap(s, _api(s).callRate(genotypes._jdf, sample_col, gt_col))


def conformal_coverage(cal, eval_df, score_col, alpha_permille=100):
    """Split-conformal calibration audit: (n_cal, threshold, n_eval,
    n_covered, coverage_permille)."""
    s = cal.sparkSession
    return _wrap(s, _api(s).conformalCoverage(cal._jdf, eval_df._jdf,
                                              score_col,
                                              int(alpha_permille)))


def confident_learning_grid(df, given_col, pred_col, conf_permille_col):
    """Confident-learning label-noise census: (given_label, pred_label,
    n, n_confident)."""
    s = df.sparkSession
    return _wrap(s, _api(s).confidentLearningGrid(df._jdf, given_col,
                                                  pred_col,
                                                  conf_permille_col))


def calibration_bins(df, conf_permille_col, correct_col, bins=10):
    """ECE/reliability report over stated confidence: (bin, n,
    conf_permille, acc_permille, gap_permille, ece_permille)."""
    s = df.sparkSession
    return _wrap(s, _api(s).calibrationBins(df._jdf, conf_permille_col,
                                            correct_col, int(bins)))


def trimmed_mean_by_group(df, group_col, value_col, tie_break,
                          lo_permille=50, hi_permille=950):
    """Per-group trimmed mean: (group, n, n_kept, trimmed_mean)."""
    s = df.sparkSession
    return _wrap(s, _api(s).trimmedMeanByGroup(df._jdf, group_col,
                                               value_col, tie_break,
                                               int(lo_permille),
                                               int(hi_permille)))


def atkinson_index(df, group_col, value_col):
    """Per-group Atkinson (eps=2) inequality index: (group, n,
    atkinson)."""
    s = df.sparkSession
    return _wrap(s, _api(s).atkinsonIndex(df._jdf, group_col, value_col))


def mad_by_group(df, group_col, value_col, tie_break):
    """Per-group median + median absolute deviation: (group, n, median,
    mad)."""
    s = df.sparkSession
    return _wrap(s, _api(s).madByGroup(df._jdf, group_col, value_col,
                                       tie_break))
