package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SamplingOps, SimilarityOps, TextOps, WebOps}

/** Training-data pipeline operators over `documents` / `embeddings`
  * (SURVEY.md §7 step 10): text analysis, exact + near dedup, similarity
  * search. Oracle SQL is generated from the SAME Scala constants as the
  * Spark implementation wherever the op is SQL-expressible; MinHash/SimHash/
  * LSH signatures use engine-side hashing and are declared without an
  * oracle (driver falls back to the rows-only check) but are covered by
  * ScalaTest property specs.
  */
object PipelineQueries extends QuerySet {

  /** DuckDB twin of [[TextOps.langScore]]: padded lowercase text, literal
    * replace-count per marker, integer arithmetic only. */
  private def langScoreSql(markers: Seq[String]): String =
    markers.map { kw =>
      val esc = kw.replace("'", "''")
      s"(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '$esc', ''))) / ${kw.length}"
    }.mkString(" + ")

  private def langIdSql: String = {
    val scores = TextOps.langMarkers.map { case (lang, kws) =>
      lang -> s"(${langScoreSql(kws)})"
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (lang, sc) =>
      s"WHEN $sc = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  val queries: Seq[Query] = Seq(

    // Per-document text statistics (token counting, quality ratios).
    Query("q21_doc_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val feats = TextOps.qualityFeatures(col("text")).map {
          // int feature columns → long so the schema matches the oracle's
          // BIGINT exactly (driver compares schemas too).
          case (n @ ("n_chars" | "n_tokens"), c) => (n, c.cast("long"))
          case other => other
        }
        feats.foldLeft(d.select(col("doc_id"), col("text"))) {
          case (df, (n, c)) => df.withColumn(n, c)
        }.drop("text")
      },
      Some("""SELECT doc_id,
        length(text) AS n_chars,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
        CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / length(text) AS upper_ratio,
        CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS DOUBLE) / length(text) AS ws_ratio
        FROM documents""")),

    // Stopword-evidence language ID vs the labeled lang column.
    Query("q22_lang_id",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.langId(col("text")).as("pred_lang")),
      Some(s"SELECT doc_id, lang, $langIdSql AS pred_lang FROM documents")),

    // Quality filter (C4/Gopher-style heuristic gates).
    Query("q23_quality_filter",
      (s, dir) => t(s, dir, "documents")
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .filter(col("quality") >= 0.75)
        .select("doc_id", "quality"),
      Some("""WITH scored AS (SELECT doc_id,
          ((CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) <= 0.1 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) <= 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / length(text) <= 0.3 THEN 1.0 ELSE 0.0 END)) / 4.0
          AS quality FROM documents)
        SELECT doc_id, quality FROM scored WHERE quality >= 0.75""")),

    // Exact duplicate groups on the normalized-md5 fingerprint.
    Query("q24_exact_dedup",
      (s, dir) => DedupOps.exactDuplicates(
        t(s, dir, "documents"), "doc_id", "text"),
      Some("""SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
          CAST(min(doc_id) AS BIGINT) AS canonical_id,
          count(*) AS group_size
        FROM documents
        GROUP BY fp HAVING count(*) > 1""")),

    // Document fingerprints (md5 of whitespace-normalized lowercase text).
    Query("q25_fingerprints",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
        md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents""")),

    // Token-count histogram (10-token buckets).
    Query("q26_token_histogram",
      (s, dir) => t(s, dir, "documents")
        .select((TextOps.tokenCount(col("text")).cast("long"))
          .as("n_tokens"))
        .select(expr("n_tokens div 10").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_docs")),
      Some("""SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) // 10 AS bucket,
        count(*) AS n_docs
        FROM documents GROUP BY bucket""")),

    // Brute-force exact cosine top-5 — ANN baseline. Ranks only in the
    // output (float similarity values are engine-comparable for ordering
    // but not for hashing).
    Query("q27_ann_bruteforce",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        SimilarityOps.bruteForceTopK(q, c, 5)
          .select(col("qid"), col("rank").cast("long").as("rank"), col("id"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
          FROM embeddings WHERE vec_id < 8),
        scored AS (SELECT q.qid, e.vec_id AS id,
          list_cosine_similarity(q.qe, e.embedding) AS cos
          FROM embeddings e CROSS JOIN q),
        ranked AS (SELECT qid, id,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id ASC) AS rank
          FROM scored)
        SELECT qid, CAST(rank AS BIGINT) AS rank, id FROM ranked
        WHERE rank <= 5""")),

    // MinHash-LSH near-duplicate candidates. The oracle re-states the full
    // fnv1a64/splitmix64 signature + banding math in DuckDB SQL (HUGEINT
    // mod-2^64 arithmetic, HashOracleSql) over naive all-pairs — a hash
    // match proves the banded-join candidate generation and the signature
    // agreement estimate exactly.
    Query("q28_minhash_neardup",
      (s, dir) => DedupOps.minhashNearDuplicates(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, shingleN = 3, bands = 16, threshold = 0.5),
      Some(HashOracleSql.minhashNearDupSql(
        numHashes = 64, shingleN = 3, bands = 16, threshold = 0.5))),

    // Incremental MinHash dedup: a small incoming batch (doc_id % 7 == 0)
    // probed against the signature INDEX of the remaining corpus — the
    // streaming-ingest shape (corpus never re-signed or self-joined). The
    // oracle replays the signatures and restates banding as band-slice
    // equality, like q28.
    Query("q51_minhash_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val incoming = docs.filter(col("doc_id") % 7 === 0)
        val index = DedupOps.minhashSignatures(
          docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
          numHashes = 64, shingleN = 3)
        DedupOps.minhashNearDuplicatesAgainst(incoming, index,
          "doc_id", "text", numHashes = 64, shingleN = 3,
          bands = 16, threshold = 0.5)
      },
      Some(HashOracleSql.minhashAgainstSql(
        numHashes = 64, shingleN = 3, bands = 16,
        threshold = 0.5, incomingMod = 7))),

    // SimHash near-duplicates by Hamming distance. The 8x8-bit banding is
    // complete for maxDist < 8, so the oracle is the naive all-pairs
    // statement of the exact signature math.
    Query("q29_simhash_neardup",
      (s, dir) => DedupOps.simhashNearDuplicates(
          t(s, dir, "documents"), "doc_id", "text", maxDist = 3)
        .withColumn("hamming", col("hamming").cast("long")),
      Some(HashOracleSql.simhashNearDupSql(maxDist = 3))),

    // Exact n-gram Jaccard verification of MinHash candidates — oracle =
    // the same signature/banding SQL at the candidate threshold, then exact
    // set Jaccard over the true shingle sets.
    Query("q30_ngram_jaccard",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cand = DedupOps.minhashNearDuplicates(
          docs, "doc_id", "text", numHashes = 64, shingleN = 3,
          bands = 16, threshold = 0.3).select("id_a", "id_b")
        DedupOps.ngramJaccard(docs, cand, "doc_id", "text", shingleN = 3)
          .filter(col("jaccard") >= 0.5)
      },
      Some(HashOracleSql.minhashThenExactJaccardSql(
        numHashes = 64, shingleN = 3, bands = 16,
        candThreshold = 0.3, verifyThreshold = 0.5))),

    // EXACT all-pairs n-gram Jaccard >= 0.5 via the prefix-filtered
    // set-similarity join (AllPairs/PPJoin) — the hash match against the
    // naive all-pairs SQL proves the prefix filter loses no pair.
    Query("q41_jaccard_join_exact",
      (s, dir) => DedupOps.jaccardSimilarityJoin(
        t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.5),
      Some("""WITH toks AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(CASE
              WHEN len(t) = 0 THEN []
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                    for i in generate_series(1, len(t)-2)]
            END) AS s
          FROM toks),
        ex AS (SELECT doc_id, unnest(s) AS tok FROM sh),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sizes AS (SELECT doc_id, len(s) AS n FROM sh)
        SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
          CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_inter >= 0.5 * (sa.n + sb.n - n_inter)""")),

    // Duplicate-pair clustering (connected components by min-label
    // propagation) over a deterministic pair graph of stars bridged by
    // chains — hash-matched against DuckDB's recursive-CTE transitive
    // closure, proving the iterative propagation computes exact components
    // including multi-hop merges.
    Query("q42_dedup_clusters",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val star = c.filter(col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey").as("id_a"),
            (col("c_custkey") - col("c_custkey") % 5).as("id_b"))
        val chain = c.filter(col("c_custkey") % 50 < 8)
          .select(col("c_custkey").as("id_a"),
            (col("c_custkey") + 1).as("id_b"))
        DedupOps.clusterDuplicates(star.union(chain))
          .select(col("id"), col("cluster_id"))
      },
      Some("""WITH RECURSIVE pairs AS (
          SELECT c_custkey AS id_a, c_custkey - c_custkey % 5 AS id_b
          FROM customer WHERE c_custkey % 5 <> 0
          UNION ALL
          SELECT c_custkey, c_custkey + 1 FROM customer WHERE c_custkey % 50 < 8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id)
        SELECT CAST(id AS BIGINT) AS id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // Drop-duplicates materialization: keep the minimum doc_id per
    // normalized fingerprint (DedupOps.dropExactDuplicates semantics).
    Query("q36_drop_duplicates",
      (s, dir) => graft.operators.DedupOps.dropExactDuplicates(
          t(s, dir, "documents").select("doc_id", "text", "lang"),
          "doc_id", "text")
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM (
          SELECT doc_id, lang, row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
          FROM documents)
        WHERE rn = 1""")),

    // k-mer counting (the countKmers shape, AlignmentDataset.scala:784-795)
    // over document text: all 8-grams occurring >= 20 times.
    Query("q32_kmer_count",
      (s, dir) => t(s, dir, "documents")
        .select(explode(graft.functions.GenomicFunctions.kmers("text", 8))
          .as("kmer"))
        .filter(length(col("kmer")) === 8)
        .groupBy("kmer").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20),
      Some("""SELECT substr(text, CAST(i AS INTEGER), 8) AS kmer, count(*) AS n
        FROM documents, unnest(generate_series(1, length(text) - 7)) AS t(i)
        GROUP BY kmer HAVING count(*) >= 20""")),

    // SRP-LSH approximate top-k (the ANN scale path; full DuckDB oracle,
    // recall vs q27 asserted in ScalaTest).
    Query("q31_ann_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        SimilarityOps.lshTopK(q, c, 5, numBits = 16, bands = 8)
          .select(col("qid"), col("rank").cast("long").as("rank"), col("id"))
      },
      // full oracle: splitmix64 hyperplane signs + banding + cosine re-rank
      // replayed in DuckDB (ordered list_reduce fold = the UDF's loop)
      Some(HashOracleSql.srpLshTopKSql(
        numBits = 16, bands = 8, dim = 64, k = 5, qidMax = 8))),

    // Embedding-cosine near-duplicate pairs, exact (id pairs only — float
    // similarity values are not engine-hashable; double-precision math on
    // both sides so the threshold cut agrees).
    Query("q37_embedding_neardup",
      (s, dir) => SimilarityOps.cosineNearDuplicates(
        t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.35),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.35""")),

    // Hard-negative mining for contrastive training: for 8 anchor
    // vectors, the 5 most-similar embeddings with a DIFFERENT label —
    // the confusable-but-wrong examples triplet losses train on. Same
    // broadcast-anchors/one-scan shape as q27 with the label-mismatch
    // predicate before ranking.
    Query("q123_hard_negatives",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val anchors = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("label").as("q_label"))
        SimilarityOps.hardNegativesTopK(anchors,
          e.select(col("vec_id").as("id"), col("embedding").as("vec"),
            col("label")), k = 5)
          .select(col("qid"), col("q_label").cast("long").as("q_label"),
            col("rank").cast("long").as("rank"), col("id"),
            col("neg_label").cast("long").as("neg_label"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe,
          |    label AS ql FROM embeddings WHERE vec_id < 8),
          |scored AS (SELECT q.qid, q.ql, e.vec_id AS id, e.label,
          |    list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
          |      CAST(e.embedding AS DOUBLE[])) AS cos
          |  FROM embeddings e CROSS JOIN q
          |  WHERE e.label <> q.ql),
          |ranked AS (SELECT qid, ql, id, label,
          |    row_number() OVER (
          |      PARTITION BY qid ORDER BY cos DESC, id ASC) AS rank
          |  FROM scored)
          |SELECT qid, CAST(ql AS BIGINT) AS q_label,
          |  CAST(rank AS BIGINT) AS rank, id,
          |  CAST(label AS BIGINT) AS neg_label
          |FROM ranked WHERE rank <= 5""".stripMargin)),

    // MMR diversified retrieval (Carbonell & Goldstein 1998): top-10 for
    // the vec_id=0 query with lambda=0.7 over a 200-candidate relevance
    // prefilter — the dedup-aware retrieval step RAG pipelines run so the
    // context window isn't k copies of the same passage. Greedy rounds
    // and IEEE score arithmetic replay exactly in the unrolled oracle.
    Query("q120_mmr_diversified_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qv = e.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .head.getSeq[Double](0).toSeq
        SimilarityOps.mmrSelect(e.filter(col("vec_id") =!= 0), qv,
          k = 10, lambda = 0.7, nCandidates = 200,
          idCol = "vec_id", vecCol = "embedding")
      },
      Some(HashOracleSql.mmrSql(k = 10, lambda = 0.7, nCandidates = 200))),

    // IVF approximate top-k (partition-pruned ANN; full DuckDB oracle, exact
    // equivalence to brute force at nProbe == nCentroids asserted in
    // ScalaTest).
    Query("q38_ivf_ann",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        SimilarityOps.ivfTopK(q, c, 5, nCentroids = 32, nProbe = 8)
          .select(col("qid"), col("rank").cast("long").as("rank"), col("id"))
      },
      // full oracle: splitmix64 centroid sample + argmax assignment +
      // probe lists + cosine re-rank replayed in DuckDB
      Some(HashOracleSql.ivfTopKSql(
        nCentroids = 32, nProbe = 8, k = 5, qidMax = 8))),

    // Benchmark decontamination: distinct 5-gram collisions between the
    // corpus (doc_id % 20 != 0) and a held-out "benchmark" slice
    // (doc_id % 20 == 0) — the GPT-3/Pile-style test-set-overlap filter.
    // Oracle restates the shingle semantics via HashOracleSql.shingleCtes.
    Query("q43_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 20 === 0)
          .select(col("text").as("bench_text"))
        val corpus = docs.filter(col("doc_id") % 20 =!= 0)
        TextOps.contaminationHits(corpus, bench, "doc_id", "text",
          "bench_text", ngramN = 5, minHits = 2)
      },
      Some(s"""WITH ${HashOracleSql.shingleCtes(5)},
        bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
        corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0)
        SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM corpus c JOIN bench USING (g)
        GROUP BY c.doc_id HAVING count(*) >= 2""")),

    // GPT-style sequence packing: documents concatenated in doc_id order
    // into one token stream, cut into 512-token training sequences; one
    // span per (document, sequence) crossing. The Spark side is a
    // distributed two-phase prefix sum (no global-order window); the oracle
    // is the single-window naive statement of the same layout.
    Query("q44_pack_sequences",
      (s, dir) => TextOps.packTokenSpans(
        t(s, dir, "documents"), "doc_id", "text", seqLen = 512),
      Some("""WITH sized AS (
          SELECT doc_id,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n
          FROM documents),
        offs AS (
          SELECT doc_id, n,
            CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
          FROM sized),
        spans AS (
          SELECT doc_id, n, off,
            unnest(generate_series(off // 512, (off + n - 1) // 512)) AS seq_id
          FROM offs WHERE n > 0)
        SELECT doc_id, seq_id,
          greatest(off, seq_id * 512) - off AS doc_off,
          least(off + n, (seq_id + 1) * 512) - greatest(off, seq_id * 512) AS len
        FROM spans""")),

    // Gopher-style repetition statistics (Rae et al. 2021 table A1): per
    // document, the integer numerators of the published repetition-removal
    // filters — most-frequent-2/3-gram char coverage, duplicated-5/10-gram
    // char coverage — plus token counts. Spark computes them in one
    // compiled per-row pass (zero shuffles); the oracle restates them as
    // the naive unnest + group-by.
    Query("q45_repetition_stats",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextOps.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"), col("r.n_tokens"), col("r.n_distinct_tokens"),
          col("r.tok_chars"), col("r.top2_chars"), col("r.top3_chars"),
          col("r.dup5_chars"), col("r.dup10_chars")),
      Some {
        def grams(n: Int) =
          s"""g$n AS (SELECT doc_id,
             |  unnest([array_to_string(t[i:i+${n - 1}],' ')
             |          for i in generate_series(1, len(t)-${n - 1})]) AS g
             |  FROM toks WHERE len(t) >= $n),
             |c$n AS (SELECT doc_id, g, count(*) AS cnt FROM g$n GROUP BY doc_id, g)""".stripMargin
        def top(n: Int) =
          s"""t$n AS (SELECT doc_id, cnt * (length(g) - ${n - 1}) AS v,
             |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
             |  FROM c$n),
             |top$n AS (SELECT doc_id, v FROM t$n WHERE rn = 1)""".stripMargin
        def dup(n: Int) =
          s"""d$n AS (SELECT doc_id,
             |  sum(CASE WHEN cnt >= 2 THEN cnt * (length(g) - ${n - 1}) ELSE 0 END) AS v
             |  FROM c$n GROUP BY doc_id)""".stripMargin
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |base AS (
           |  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
           |    coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS tok_chars
           |  FROM toks),
           |${grams(2)}, ${top(2)}, ${grams(3)}, ${top(3)},
           |${grams(5)}, ${dup(5)}, ${grams(10)}, ${dup(10)}
           |SELECT b.doc_id,
           |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
           |  CAST(b.n_distinct AS BIGINT) AS n_distinct_tokens,
           |  CAST(b.tok_chars AS BIGINT) AS tok_chars,
           |  CAST(coalesce(top2.v, 0) AS BIGINT) AS top2_chars,
           |  CAST(coalesce(top3.v, 0) AS BIGINT) AS top3_chars,
           |  CAST(coalesce(d5.v, 0) AS BIGINT) AS dup5_chars,
           |  CAST(coalesce(d10.v, 0) AS BIGINT) AS dup10_chars
           |FROM base b
           |LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
           |LEFT JOIN d5 USING (doc_id) LEFT JOIN d10 USING (doc_id)""".stripMargin
      }),

    // Domain mixing: down-sample per-language strata to a target mixture
    // at the largest achievable size (bottleneck stratum kept whole), the
    // keep decision a deterministic per-row hash — GPT-3/Gopher-style data
    // re-weighting. The oracle replays the fnv1a64 uniform bit-for-bit.
    Query("q46_domain_mix",
      (s, dir) => SamplingOps.mixToWeights(
        t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1, "es" -> 0.1),
        salt = "mix")
        .select(col("doc_id"), col("lang")),
      Some(s"""WITH counts AS (
        SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        w(lang, w) AS (VALUES ('en',0.4),('de',0.2),('fr',0.2),('zh',0.1),('es',0.1)),
        cw AS (SELECT c.lang, c.n, w.w FROM counts c JOIN w USING (lang)),
        tmin AS (SELECT min(n / w) AS t FROM cw),
        rates AS (SELECT lang, least(1.0, w * t / n) AS rate FROM cw, tmin)
        SELECT d.doc_id, d.lang FROM documents d JOIN rates r USING (lang)
        WHERE ${HashOracleSql.uniformSql("d.doc_id::VARCHAR", "mix")} < r.rate""")),

    // PII redaction audit: emails/IPv4s/phone numbers scrubbed from text
    // synthesized over customer rows (the testdata documents carry no PII,
    // so the query plants deterministic PII from customer columns first).
    // Patterns live in the Java-regex ∩ RE2 subset — the oracle runs the
    // SAME pattern strings ('g' flag: DuckDB replaces first-only by
    // default, Spark replaces all).
    Query("q47_redact_pii",
      (s, dir) => {
        val phone = concat(
          lit("25-"), lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((col("c_custkey") % 997).cast("string"), 3, "0"),
          lit("-"), lpad((col("c_custkey") % 9973).cast("string"), 4, "0"))
        val text = concat(col("c_mktsegment"), lit(" contact "), col("c_name"),
          lit("@example.com ip 10.0.0."), (col("c_custkey") % 256),
          lit(" phone "), phone)
        t(s, dir, "customer")
          .select(col("c_custkey"), text.as("raw"))
          .select(col("c_custkey"),
            TextOps.redactPii(col("raw")).as("redacted"),
            TextOps.piiCounts(col("raw")).as("p"))
          .select(col("c_custkey"), col("redacted"),
            col("p.n_emails"), col("p.n_ips"), col("p.n_phones"))
      },
      Some {
        // DuckDB string literals are backslash-verbatim: the Scala pattern
        // string passes through unchanged (only quotes need escaping)
        val redact = TextOps.piiPatterns.foldLeft("raw") { case (e, (pat, repl)) =>
          val p = pat.replace("'", "''")
          s"regexp_replace($e, '$p', '$repl', 'g')"
        }
        def cnt(tok: String) =
          s"CAST((length(redacted) - length(replace(redacted, '$tok', ''))) / ${tok.length} AS BIGINT)"
        s"""WITH raws AS (
           |  SELECT c_custkey,
           |    c_mktsegment || ' contact ' || c_name || '@example.com ip 10.0.0.'
           |      || (c_custkey % 256) || ' phone 25-'
           |      || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-'
           |      || lpad((c_custkey % 997)::VARCHAR, 3, '0') || '-'
           |      || lpad((c_custkey % 9973)::VARCHAR, 4, '0') AS raw
           |  FROM customer),
           |red AS (SELECT c_custkey, $redact AS redacted FROM raws)
           |SELECT c_custkey, redacted,
           |  ${cnt("<EMAIL>")} AS n_emails,
           |  ${cnt("<IP>")} AS n_ips,
           |  ${cnt("<PHONE>")} AS n_phones
           |FROM red""".stripMargin
      }),

    // End-to-end training-data pipeline in ONE Catalyst plan: quality
    // filter -> exact dedup -> benchmark decontamination -> domain mixing
    // -> per-(lang, source) corpus counts. Each stage's SQL twin is
    // individually verified by q23/q24/q43/q46; this query proves they
    // COMPOSE — the whole pipeline optimizes as a single declarative plan
    // (one pass over the corpus plus the dedup/decontamination shuffles).
    Query("q48_pipeline_e2e",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val quality = docs.filter(TextOps.qualityScore(col("text")) >= 0.75)
        val deduped = DedupOps.dropExactDuplicates(quality, "doc_id", "text")
        val bench = docs.filter(col("doc_id") % 20 === 0)
          .select(col("text").as("bench_text"))
        val corpus = deduped.filter(col("doc_id") % 20 =!= 0)
        val clean = TextOps.dropContaminated(corpus, bench, "doc_id", "text",
          "bench_text", ngramN = 8, minHits = 1)
        val mixed = SamplingOps.mixToWeights(clean, "lang", "doc_id",
          Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1, "es" -> 0.1),
          salt = "e2e")
        mixed.groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH q AS (
        SELECT * FROM documents WHERE
          ((CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) <= 0.1 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) <= 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / length(text) <= 0.3 THEN 1.0 ELSE 0.0 END)) / 4.0 >= 0.75),
        d AS (
          SELECT * FROM q
          QUALIFY row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
            ORDER BY doc_id) = 1),
        btoks AS (
          SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
          FROM documents WHERE doc_id % 20 = 0),
        bgrams AS (
          SELECT DISTINCT unnest(CASE WHEN len(t) = 0 THEN []
            WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
            ELSE [array_to_string(t[i:i+7], ' ')
                  for i in generate_series(1, len(t) - 7)] END) AS g
          FROM btoks),
        ctoks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
          FROM d WHERE doc_id % 20 <> 0),
        cgrams AS (
          SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) = 0 THEN []
            WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
            ELSE [array_to_string(t[i:i+7], ' ')
                  for i in generate_series(1, len(t) - 7)] END)) AS g
          FROM ctoks),
        contaminated AS (
          SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams USING (g)),
        clean AS (
          SELECT * FROM d WHERE doc_id % 20 <> 0
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        counts AS (SELECT lang, count(*) AS n FROM clean GROUP BY lang),
        w(lang, w) AS (VALUES ('en',0.4),('de',0.2),('fr',0.2),('zh',0.1),('es',0.1)),
        cw AS (SELECT c.lang, c.n, w.w FROM counts c JOIN w USING (lang)),
        tmin AS (SELECT min(n / w) AS t FROM cw),
        rates AS (SELECT lang, least(1.0, w * t / n) AS rate FROM cw, tmin),
        mixed AS (
          SELECT c.* FROM clean c JOIN rates r USING (lang)
          WHERE ${HashOracleSql.uniformSql("c.doc_id::VARCHAR", "e2e")} < r.rate)
        SELECT lang, source, count(*) AS n_docs FROM mixed GROUP BY lang, source""")),

    // REAL image decode through the pure-JVM BMP codec: each document id
    // deterministically generates grayscale pixels, Spark ENCODES them as a
    // 24-bit BMP byte payload and decodes it back through
    // MultimodalOps.imageStats (graft.sources.Bmp). The oracle replays the
    // pixel-generation arithmetic directly — so a hash match proves the
    // BMP encode→decode round trip is exact on every image (any padding /
    // row-order / luma bug would shift a bin). All-integer output.
    Query("q52_bmp_image_stats",
      (s, dir) => {
        val bmpUdf = udf { id: Long =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toInt)
          graft.sources.Bmp.encode(w, h, px)
        }
        val media = t(s, dir, "documents").select(
          col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
        graft.operators.MultimodalOps.imageStats(media)
      },
      Some("""WITH dims AS (
          SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
                 CAST(8 + doc_id % 7 AS BIGINT) AS h
          FROM documents),
        px AS (
          SELECT doc_id,
            (doc_id * 31 + unnest(generate_series(0, w * h - 1)) * 7) % 256 AS gray
          FROM dims),
        binned AS (
          SELECT doc_id AS media_id, CAST(gray // 16 AS INTEGER) AS bin,
            count(*) AS bin_count, CAST(sum(gray) AS BIGINT) AS bin_sum
          FROM px GROUP BY 1, 2)
        SELECT media_id, bin, bin_count,
          CAST(sum(bin_count) OVER (PARTITION BY media_id) AS BIGINT) AS n_px,
          CAST(sum(bin_sum) OVER (PARTITION BY media_id) AS BIGINT) AS sum_gray
        FROM binned""")),

    // REAL audio decode through the pure-JVM WAV codec, same proof shape
    // as q52: deterministic 16-bit PCM samples per document, Spark ENCODES
    // them as a RIFF/WAVE payload and decodes it back through
    // MultimodalOps.audioStats (graft.sources.Wav); the oracle replays the
    // sample arithmetic. A header/chunk-walk/sign bug would shift a
    // window's integer sums.
    Query("q53_wav_audio_stats",
      (s, dir) => {
        val wavUdf = udf { id: Long =>
          val n = (256 * (2 + id % 4)).toInt
          val smp = Array.tabulate(n)(i =>
            (((id * 37 + i * 11) % 4096) - 2048).toInt)
          graft.sources.Wav.encode(16000, smp)
        }
        val media = t(s, dir, "documents").select(
          col("doc_id").as("media_id"), wavUdf(col("doc_id")).as("payload"))
        graft.operators.MultimodalOps.audioStats(media, windowSamples = 256)
      },
      Some("""WITH dims AS (
          SELECT doc_id, CAST(256 * (2 + doc_id % 4) AS BIGINT) AS n
          FROM documents),
        px AS (
          SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM dims),
        s AS (
          SELECT doc_id, n, i,
            (doc_id * 37 + i * 11) % 4096 - 2048 AS v,
            CAST(i // 256 AS INTEGER) AS w, i % 256 AS j
          FROM px),
        lagged AS (
          SELECT doc_id, n, w, v,
            lag(v) OVER (PARTITION BY doc_id, w ORDER BY j) AS pv
          FROM s)
        SELECT doc_id AS media_id, w AS window,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
          CAST(sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0))
            THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
          CAST(max(n) AS BIGINT) AS n_samples
        FROM lagged GROUP BY 1, 2""")),

    // REAL video decode through the pure-JVM AVI container codec, same
    // proof shape as q52/q53: deterministic 6x4 grayscale frames per
    // document, Spark ENCODES them as a RIFF/AVI payload (24-bit DIB
    // frames) and decodes it back through MultimodalOps.videoStats
    // (graft.sources.Avi); the oracle replays the pixel arithmetic. A
    // header/chunk-walk/row-order bug shifts a frame's sums; a
    // frame-ORDER bug shifts motion_abs.
    Query("q54_avi_video_stats",
      (s, dir) => {
        val aviUdf = udf { id: Long =>
          val nf = (2 + id % 3).toInt
          val frames = Array.tabulate(nf)(f =>
            Array.tabulate(24)(i => ((id * 13 + f * 7 + i * 3) % 256).toInt))
          graft.sources.Avi.encode(6, 4, 40000, frames)
        }
        val media = t(s, dir, "documents").select(
          col("doc_id").as("media_id"), aviUdf(col("doc_id")).as("payload"))
        graft.operators.MultimodalOps.videoStats(media)
      },
      Some("""WITH dims AS (
          SELECT doc_id, CAST(2 + doc_id % 3 AS BIGINT) AS nf
          FROM documents),
        fr AS (
          SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f FROM dims),
        px AS (
          SELECT doc_id, f, unnest(generate_series(0, 23)) AS i FROM fr),
        v AS (
          SELECT doc_id, f, i,
            (doc_id * 13 + f * 7 + i * 3) % 256 AS g,
            (doc_id * 13 + (f - 1) * 7 + i * 3) % 256 AS gp
          FROM px)
        SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame,
          CAST(count(*) AS BIGINT) AS n_px,
          CAST(sum(g) AS BIGINT) AS sum_gray,
          CAST(sum(CASE WHEN f = 0 THEN 0 ELSE abs(g - gp) END) AS BIGINT)
            AS motion_abs
        FROM v GROUP BY 1, 2""")),

    // C4-style paragraph-level dedup: multi-paragraph docs are composed
    // in-plan (the corpus text has no newlines) from a small shared pool
    // plus per-doc unique paragraphs and deliberate in-doc repeats; only
    // the globally first (min (doc_id, idx)) occurrence of each paragraph
    // survives, docs reassembled in order. The oracle replays the whole
    // pipeline with a row_number window.
    Query("q55_paragraph_dedup",
      (s, dir) => {
        val pool = (k: Int) => concat(lit("para "),
          ((col("doc_id") * 7 + lit(k * 13)) % 97).cast("string"))
        val composed = t(s, dir, "documents").select(
          col("doc_id"),
          concat_ws("\n\n",
            pool(0), pool(1), pool(2),
            when(col("doc_id") % 5 === 0, pool(0)) // in-doc repeat
              .otherwise(concat(lit("extra "), col("doc_id").cast("string"))))
            .as("text"))
        graft.operators.DedupOps
          .dedupParagraphs(composed, "doc_id", "text")
          .select(col("doc_id"), col("text").as("cleaned_text"))
      },
      Some("""WITH ks AS (
          SELECT doc_id, unnest(generate_series(0, 3)) AS k FROM documents),
        paras AS (
          SELECT doc_id, k,
            CASE WHEN k < 3
              THEN 'para ' || CAST((doc_id * 7 + k * 13) % 97 AS VARCHAR)
            WHEN doc_id % 5 = 0
              THEN 'para ' || CAST((doc_id * 7) % 97 AS VARCHAR)
            ELSE 'extra ' || CAST(doc_id AS VARCHAR) END AS para
          FROM ks),
        ranked AS (
          SELECT doc_id, k, para,
            row_number() OVER (PARTITION BY para ORDER BY doc_id, k) AS rn
          FROM paras)
        SELECT doc_id,
          COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
            chr(10) || chr(10) ORDER BY k), '') AS cleaned_text
        FROM ranked GROUP BY doc_id""")),

    // The inspection side of the same operator: which paragraphs repeat,
    // how often, in how many docs, and where they first occur.
    Query("q56_duplicated_paragraphs",
      (s, dir) => {
        val pool = (k: Int) => concat(lit("para "),
          ((col("doc_id") * 7 + lit(k * 13)) % 97).cast("string"))
        val composed = t(s, dir, "documents").select(
          col("doc_id"),
          concat_ws("\n\n", pool(0), pool(1), pool(2)).as("text"))
        graft.operators.DedupOps
          .duplicatedParagraphs(composed, "doc_id", "text")
      },
      Some("""WITH ks AS (
          SELECT doc_id, unnest(generate_series(0, 2)) AS k FROM documents),
        paras AS (
          SELECT doc_id, k,
            'para ' || CAST((doc_id * 7 + k * 13) % 97 AS VARCHAR) AS para
          FROM ks)
        SELECT para,
          CAST(count(*) AS BIGINT) AS n_occurrences,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(min(doc_id) AS BIGINT) AS first_id,
          CAST(min(k) FILTER (WHERE doc_id = (
            SELECT min(p2.doc_id) FROM paras p2 WHERE p2.para = paras.para))
            AS INTEGER) AS first_idx
        FROM paras GROUP BY para HAVING count(*) > 1""")),

    // C4 line-level cleaning (Raffel et al. 2020 §2.2) over in-plan
    // composed lines: per (doc, line j) a deterministic word count (via
    // substr of a fixed word run), terminal-punctuation/none/brace
    // suffixes, and an occasional "javascript " prefix. The operator is a
    // codegen'd higher-order filter (no UDF); the oracle replays every
    // rule. cleaned_text preserves line order.
    Query("q57_c4_line_filter",
      (s, dir) => {
        val d = col("doc_id")
        def line(j: Int): Column = concat(
          when((d + j) % 7 === 0, lit("javascript ")).otherwise(lit("")),
          lit("w w w w w").substr(lit(1), ((d + j) % 5) * 2 + 1),
          when((d * 3 + j) % 4 === 0, lit("."))
            .when((d * 3 + j) % 4 === 1, lit("!"))
            .when((d * 3 + j) % 4 === 2, lit(""))
            .otherwise(lit(" {")))
        val composed = t(s, dir, "documents").select(
          d, concat_ws("\n", (0 until 6).map(line): _*).as("text"))
        composed.select(
          col("doc_id"),
          graft.operators.TextOps.c4CleanLines(col("text")).as("cleaned_text"),
          size(graft.operators.TextOps.c4KeepLines(col("text"))).as("n_kept"),
          size(split(col("text"), "\n")).as("n_total"))
      },
      Some("""WITH js AS (
          SELECT doc_id, unnest(generate_series(0, 5)) AS j FROM documents),
        lines AS (
          SELECT doc_id, j,
            CASE WHEN (doc_id + j) % 7 = 0 THEN 'javascript ' ELSE '' END ||
            substring('w w w w w', 1,
              CAST(((doc_id + j) % 5) * 2 + 1 AS INTEGER)) ||
            CASE (doc_id * 3 + j) % 4 WHEN 0 THEN '.' WHEN 1 THEN '!'
              WHEN 2 THEN '' ELSE ' {' END AS line
          FROM js),
        flags AS (
          SELECT doc_id, j, line,
            (line LIKE '%.' OR line LIKE '%!')
              AND length(line) - length(replace(line, ' ', '')) + 1 >= 3
              AND line NOT LIKE '%{%'
              AND line NOT LIKE '%javascript%' AS keep
          FROM lines)
        SELECT doc_id,
          COALESCE(string_agg(CASE WHEN keep THEN line END,
            chr(10) ORDER BY j), '') AS cleaned_text,
          CAST(count(*) FILTER (WHERE keep) AS INTEGER) AS n_kept,
          CAST(count(*) AS INTEGER) AS n_total
        FROM flags GROUP BY doc_id""")),

    // Embedding near-dup via SRP-LSH banding (the scale path q37's exact
    // triangle join approximates AT): 32-bit signatures in 4 8-bit bands,
    // candidates only within band buckets, exact double cosine cut. Full
    // oracle — the splitmix64 hyperplane signs, banding and threshold are
    // all replayed in DuckDB (same machinery as q31).
    Query("q58_embedding_neardup_lsh",
      (s, dir) => SimilarityOps.lshNearDuplicates(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, numBits = 32, bands = 4),
      Some(HashOracleSql.srpNearDupSql(
        numBits = 32, bands = 4, dim = 64, threshold = 0.35))),

    // RefinedWeb-style within-doc repeated-line removal: lines composed
    // in-plan with triangular-number offsets mod 5, so each doc repeats
    // some line contents at later indices; only each content's FIRST
    // in-doc occurrence survives, order preserved. Pure per-row
    // higher-order expression (no shuffle); oracle replays it with a
    // min-over window.
    Query("q59_dedup_lines_in_doc",
      (s, dir) => {
        val d = col("doc_id")
        val tri = Seq(0, 1, 3, 6, 10, 15)
        val composed = t(s, dir, "documents").select(
          d, concat_ws("\n", tri.map(o =>
            concat(lit("L"), ((d + o) % 5).cast("string"))): _*).as("text"))
        composed.select(col("doc_id"),
          graft.operators.TextOps.dedupLinesInDoc(col("text"))
            .as("cleaned_text"))
      },
      Some("""WITH js AS (
          SELECT doc_id, unnest(generate_series(0, 5)) AS j FROM documents),
        lines AS (
          SELECT doc_id, j,
            'L' || CAST((doc_id + (j * (j + 1)) // 2) % 5 AS VARCHAR) AS line
          FROM js),
        firsts AS (
          SELECT doc_id, j, line,
            min(j) OVER (PARTITION BY doc_id, line) AS fj
          FROM lines)
        SELECT doc_id,
          COALESCE(string_agg(CASE WHEN j = fj THEN line END,
            chr(10) ORDER BY j), '') AS cleaned_text
        FROM firsts GROUP BY doc_id""")),

    // ExactSubstr dedup (Lee et al. 2021) on the REAL documents text:
    // every 30-char window occurring >= 2x corpus-wide is excised except
    // its globally first (doc_id, pos) occurrence; overlapping/adjacent
    // windows merge into spans. The oracle replays windows + keep-first +
    // gaps-and-islands span merge + complement reconstruction in DuckDB
    // (site encoded as doc_id*1e6+p — equivalent to the operator's
    // min(struct(id, p)) for these ids/positions).
    Query("q60_exact_substr_dedup",
      (s, dir) => DedupOps.exactSubstrDedupReport(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", minLen = 30),
      Some("""WITH w AS (
          SELECT doc_id, text,
            unnest(generate_series(1, length(text) - 29)) AS p1
          FROM documents WHERE length(text) >= 30),
        g AS (
          SELECT doc_id, p1 - 1 AS p, substr(text, p1, 30) AS gram FROM w),
        st AS (
          SELECT gram, min(doc_id * 1000000 + p) AS first_site
          FROM g GROUP BY gram HAVING count(*) > 1),
        fl AS (
          SELECT g.doc_id, g.p FROM g JOIN st USING (gram)
          WHERE g.doc_id * 1000000 + g.p <> st.first_site),
        brk AS (
          SELECT doc_id, p,
            CASE WHEN COALESCE(p > lag(p) OVER w + 30, TRUE)
              THEN 1 ELSE 0 END AS b
          FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
        isl AS (
          SELECT doc_id, p,
            sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS grp
          FROM brk),
        spans AS (
          SELECT doc_id, grp, min(p) AS s, max(p) + 30 AS e
          FROM isl GROUP BY doc_id, grp),
        pieces AS (
          SELECT sp.doc_id, sp.s AS ord,
            substr(d.text,
              COALESCE(lag(sp.e) OVER pw, 0) + 1,
              sp.s - COALESCE(lag(sp.e) OVER pw, 0)) AS piece
          FROM spans sp JOIN documents d USING (doc_id)
          WINDOW pw AS (PARTITION BY sp.doc_id ORDER BY sp.s)
          UNION ALL
          SELECT m.doc_id, 1000000000 AS ord,
            substr(d.text, m.mx + 1) AS piece
          FROM (SELECT doc_id, max(e) AS mx FROM spans GROUP BY doc_id) m
          JOIN documents d USING (doc_id)),
        cleanedt AS (
          SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS cleaned
          FROM pieces GROUP BY doc_id),
        stats AS (
          SELECT doc_id, count(*) AS n_spans, sum(e - s) AS removed
          FROM spans GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(COALESCE(st.n_spans, 0) AS INTEGER) AS n_dup_spans,
          CAST(COALESCE(st.removed, 0) AS INTEGER) AS removed_chars,
          COALESCE(c.cleaned, d.text) AS cleaned_text
        FROM documents d
        LEFT JOIN stats st USING (doc_id)
        LEFT JOIN cleanedt c USING (doc_id)""")),

    // Full Gopher quality-rule panel (Rae et al. 2021 A1.1) on the real
    // documents text. Oracle SQL is generated from the SAME stop-word
    // constants as the operator; every ratio is one int/int double
    // division so the replay is bit-exact.
    Query("q61_gopher_rules",
      (s, dir) => {
        val rules = TextOps.gopherQualityRules(col("text"))
        t(s, dir, "documents").select(
          col("doc_id") +: rules.map { case (n, c) => c.as(n) } :+
            TextOps.gopherKeep(col("text")).as("keep"): _*)
      },
      Some(gopherRulesSql)),

    // Vocabulary building: corpus-wide lowercase token frequencies, top
    // 100 by (count desc, token asc) — the unique-token tie-break makes
    // the cut deterministic, so LIMIT is oracle-safe.
    Query("q62_token_vocab",
      (s, dir) => TextOps.tokenFrequencies(
        t(s, dir, "documents"), "text", k = 100),
      Some("""WITH toks AS (
          SELECT unnest(list_filter(
            regexp_split_to_array(lower(text), '\s+'),
            t -> t <> '')) AS token
          FROM documents)
        SELECT token, count(*) AS n_occurrences
        FROM toks GROUP BY token
        ORDER BY n_occurrences DESC, token LIMIT 100""")),

    // BM25 retrieval scores against a fixed query bag (one rare term,
    // 'dup', for idf contrast). Scores are integer 1e-7 units quantized
    // per (doc, term) BEFORE the sum — order-free BIGINT aggregation,
    // immune to the measured 1-ulp JVM-vs-C libm ln divergence. The
    // oracle mirrors the operator's operation order token for token.
    // Positional-index phrase search: exact "table hash" occurrences per
    // doc — the precise-match retrieval primitive (quote finding). One
    // pruned posexplode + a (doc, position)-keyed adjacency equi join.
    Query("q121_phrase_search",
      (s, dir) => TextOps.phraseSearch(
        t(s, dir, "documents"), "doc_id", "text",
        phrase = Seq("table", "hash")),
      Some("""WITH tk AS (
          |  SELECT doc_id, i AS pos, ts[i] AS tok FROM (
          |    SELECT doc_id, list_filter(
          |        string_split_regex(lower(text), '[^a-z0-9]+'),
          |        x -> x <> '') AS ts
          |    FROM documents),
          |    unnest(generate_series(1, len(ts))) t(i))
          |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
          |FROM tk a JOIN tk b
          |  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          |WHERE a.tok = 'table' AND b.tok = 'hash'
          |GROUP BY a.doc_id""".stripMargin)),

    Query("q63_bm25",
      (s, dir) => TextOps.bm25Scores(
        t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("spark", "hash", "window", "merge", "dup")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '') AS ts
          FROM documents),
        dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(dl) AS BIGINT) AS dlsum FROM dl),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
          WHERE term IN ('spark', 'hash', 'window', 'merge', 'dup')
          GROUP BY doc_id, term),
        dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY term),
        c AS (
          SELECT tf.doc_id,
            CAST(floor(
              ln(1.0 + (n - df + 0.5) / (df + 0.5))
              * (tf * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf + CAST(1.2 AS DOUBLE) *
                 (1.0 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
                  (CAST(dl AS DOUBLE) / (CAST(dlsum AS DOUBLE) / n))))
              * 1e7 + 0.5) AS BIGINT) AS cq
          FROM tf JOIN dl USING (doc_id)
          CROSS JOIN stats JOIN dfs USING (term))
        SELECT doc_id, CAST(sum(cq) AS BIGINT) AS bm25_q,
          CAST(count(*) AS BIGINT) AS matched_terms
        FROM c GROUP BY doc_id""")),

    // SemDeDup (Abbas et al. 2023): deterministic IVF clustering of the
    // embeddings, then within each cluster drop the higher-centroid-
    // similarity member of every >threshold cosine pair. Full oracle —
    // centroid sample, argmax assignment, pair scan and victim rule all
    // replayed in DuckDB (same centroid CTEs as q38).
    Query("q64_semantic_dedup",
      (s, dir) => SimilarityOps.semanticDuplicates(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        nClusters = 16, threshold = 0.3),
      Some(HashOracleSql.semDedupSql(nClusters = 16, threshold = 0.3))),

    // DSIR importance resampling (Xie et al. 2023): hashed n-gram
    // multinomials (target = English docs vs the whole pool), quantized
    // log-ratio weights, deterministic Gumbel top-k over the non-target
    // rows. Weights, noise and selection all replay in DuckDB.
    Query("q65_dsir_selection",
      (s, dir) => SamplingOps.dsirWeights(
        t(s, dir, "documents"), "doc_id", "text", col("lang") === "en",
        k = 50, buckets = 1024, alpha = 1.0, salt = "dsir"),
      Some(HashOracleSql.dsirSql(buckets = 1024, alpha = 1.0, k = 50,
        targetPred = "lang = 'en'", salt = "dsir"))),

    // CCNet-style LM quality scoring: hashed bigram LM trained on the
    // English slice, every doc scored by quantized log-likelihood
    // (perplexity = exp(-lm_q/1e7/n_transitions)). Features, counts and
    // per-transition smoothed log-probs all replay in DuckDB.
    Query("q66_lm_perplexity",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val index = TextOps.lmIndex(
          docs.filter(col("lang") === "en"), "text", buckets = 4096)
        TextOps.lmScoreAgainst(docs, index, "text", buckets = 4096)
          .select(col("doc_id"), col("lm_q"), col("n_transitions"))
      },
      Some(HashOracleSql.lmSql(buckets = 4096, alpha = 1.0,
        targetPred = "lang = 'en'"))),

    // Deterministic per-stratum quota sample: exactly 20 docs per language,
    // membership a pure hash of the row key. The oracle replays the 53-bit
    // uniform and the (u, key) rank.
    Query("q67_quota_sample",
      (s, dir) => SamplingOps.quotaSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", n = 20, salt = "quota"),
      Some(s"""WITH u AS (
          SELECT doc_id, lang,
            ${HashOracleSql.uniformSql("doc_id::VARCHAR", "quota")} AS u
          FROM documents),
        r AS (SELECT doc_id, lang,
            row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
          FROM u)
        SELECT doc_id, lang FROM r WHERE rn <= 20""")),

    // Epoch-aware mixture materialization: a fixed 1000-row budget at
    // weights en/zh/de = .5/.3/.2 forces repetition (epochs > 1) for
    // under-sized strata; every copy carries its epoch index and the
    // fractional epoch is a deterministic hash sample. fr/es have no
    // weight -> dropped. The oracle replays plan + epochs + uniform.
    Query("q68_epoch_mix",
      (s, dir) => SamplingOps.materializeEpochs(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 0.3, "de" -> 0.2),
        targetRows = 1000L, salt = "epochs")
        .select(col("doc_id"), col("lang"), col("epoch")),
      Some(s"""WITH counts AS (
          SELECT lang, count(*) AS c FROM documents GROUP BY lang),
        w(lang, w) AS (VALUES ('en', 0.5), ('zh', 0.3), ('de', 0.2)),
        plan AS (
          SELECT c.lang,
            CAST(w.w AS DOUBLE) * 1000.0 / CAST(c.c AS DOUBLE) AS ep
          FROM counts c JOIN w USING (lang) WHERE
            CAST(w.w AS DOUBLE) * 1000.0 / CAST(c.c AS DOUBLE) > 0),
        e AS (
          SELECT d.doc_id, d.lang, p.ep, t.epoch
          FROM documents d JOIN plan p USING (lang),
            unnest(generate_series(0, CAST(ceil(p.ep) AS INTEGER) - 1))
              AS t(epoch))
        SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch FROM e
        WHERE epoch < floor(ep) OR (epoch = floor(ep) AND
          ${HashOracleSql.uniformSql("doc_id::VARCHAR", "epochs")} < ep - floor(ep))""")),

    // Winnowing fingerprints (MOSS): per-window rightmost-min of k-gram
    // hashes over the normalized text — guarantees shared >=13-char
    // substrings (k=8, w=6) share a fingerprint. The oracle replays the
    // selection via a HUGEINT-packed windowed min.
    Query("q69_winnowing",
      (s, dir) => TextOps.winnowingFingerprints(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8, w = 6)
        .withColumnRenamed("id", "doc_id"),
      Some(HashOracleSql.winnowingSql(k = 8, w = 6))),

    // Winnowing near-dup pairs (the MOSS match step): >= 5 shared distinct
    // fingerprints after dropping fingerprints held by > 20 docs (the
    // boilerplate suppression that also caps pair-join bucket sizes).
    Query("q70_winnowing_neardup",
      (s, dir) => TextOps.winnowingNearDuplicates(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8, w = 6, minShared = 5, maxDocFreq = 20)
        .select(col("id_a"), col("id_b"), col("n_shared")),
      Some(HashOracleSql.winnowingNearDupSql(
        k = 8, w = 6, minShared = 5, maxDocFreq = 20))),

    // Capstone selection pipeline over the round-7 family: quality gate
    // (Gopher word-count rule — the full 7-rule keep is degenerate on this
    // corpus: no doc contains 2 of the 8 English stop words) -> LM
    // perplexity gate (per-transition quantized log-prob >= -5.6e7,
    // integer arithmetic both sides) -> DSIR Gumbel-top-k over the
    // surviving pool. Every stage reuses its own proven oracle, composed
    // as nested CTEs (dsirSql parameterized over the pool table).
    Query("q72_pipeline_select",
      (s, dir) => {
        val thr = -56000000L
        val docs = t(s, dir, "documents")
        val lmIdx = TextOps.lmIndex(
          docs.filter(col("lang") === "en"), "text", buckets = 4096)
        val wordCountOk = TextOps.gopherQualityRules(col("text"))
          .toMap.apply("rule_word_count")
        val pool = TextOps.lmScoreAgainst(docs, lmIdx, "text", buckets = 4096)
          .filter(wordCountOk &&
            col("lm_q") >= lit(thr) * col("n_transitions"))
        SamplingOps.dsirWeights(pool, "doc_id", "text",
          col("lang") === "en", k = 30, buckets = 1024, salt = "sel72")
      },
      Some(s"""WITH lm AS (${HashOracleSql.lmSql(
            buckets = 4096, alpha = 1.0, targetPred = "lang = 'en'")}),
        gop AS ($gopherRulesSql),
        pool0 AS (
          SELECT d.doc_id, d.text, d.lang FROM documents d
          JOIN lm USING (doc_id) JOIN gop g USING (doc_id)
          WHERE g.rule_word_count AND
            lm.lm_q >= CAST(-56000000 AS BIGINT) * lm.n_transitions)
        SELECT * FROM (${HashOracleSql.dsirSql(
            buckets = 1024, alpha = 1.0, k = 30,
            targetPred = "lang = 'en'", salt = "sel72",
            table = "pool0")})""")),

    // HTML -> text extraction (WebOps.htmlToText): each document is
    // wrapped in a deterministic HTML page exercising script/style
    // content drops, comments, quote-guarded '>' in attributes, &nbsp; /
    // &amp; / numeric-entity decode (the text's own 'a's travel as &#97;),
    // and block-tag line breaks; the oracle states what a correct
    // extractor must recover — the round-trip proof pattern of
    // q52_bmp_image_stats.
    Query("q75_html_extract",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val wrapped = concat(
          lit("<html><head><script type=\"text/javascript\">" +
            "var a = \"1 > 0 </b>\";</script>" +
            "<style>p { color: red; }</style></head>" +
            "<body><!-- hidden <p>x</p> -->" +
            "<h1 class=\"t\" data-x=\"a>b\">Doc&nbsp;"),
          col("doc_id").cast("string"),
          lit("</h1><p> "),
          regexp_replace(col("text"), "a", "&#97;"),
          lit(" </p><div class=\"foot\">src="),
          col("source"),
          lit(" &amp; co</div></body></html>"))
        d.select(col("doc_id"),
          WebOps.htmlToText(wrapped).as("extracted"))
      },
      Some("""SELECT doc_id,
        'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN ''
             ELSE trim(regexp_replace(text, '\s+', ' ', 'g')) || chr(10) END ||
        'src=' || source || ' & co' AS extracted
        FROM documents""")),

    // URL canonicalization + URL-level dedup (WebOps.urlDedup): messy
    // URLs synthesized per doc (scheme/host case, www., default vs real
    // ports, trailing slash, unsorted query, utm_/gclid tracking params,
    // fragments) are canonicalized and grouped; the oracle REPLAYS the
    // generic parse + normalization in SQL (regexp parse, key-filtered
    // list_sort of params) rather than shortcutting from the generator's
    // structure — both engines must agree on every rule.
    Query("q76_url_dedup",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val id = col("doc_id")
        val messy = concat(
          lit("HTTP"), when(id % 2 === 0, lit("S")).otherwise(lit("")),
          lit("://WWW.Site"), (id % 5).cast("string"), lit(".COM"),
          when(id % 2 === 0, lit(":443"))
            .when(id % 3 === 0, lit(":8080")).otherwise(lit(":80")),
          lit("/Path/"), (id % 7).cast("string"),
          when(id % 3 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&b="), (id % 3).cast("string"), lit("&a=1"),
          when(id % 4 === 0, lit("&gclid=abc")).otherwise(lit("")),
          lit("#sec"), (id % 2).cast("string"))
        WebOps.urlDedup(d.select(id, messy.as("url")), "url", "doc_id")
      },
      Some(s"""WITH u0 AS (
        SELECT doc_id,
          'HTTP' || CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END ||
          '://WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.COM' ||
          CASE WHEN doc_id % 2 = 0 THEN ':443'
               WHEN doc_id % 3 = 0 THEN ':8080' ELSE ':80' END ||
          '/Path/' || CAST(doc_id % 7 AS VARCHAR) ||
          CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
          '?utm_source=feed&b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1' ||
          CASE WHEN doc_id % 4 = 0 THEN '&gclid=abc' ELSE '' END ||
          '#sec' || CAST(doc_id % 2 AS VARCHAR) AS url
        FROM documents),
      p1 AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nofrag FROM u0),
      p2 AS (SELECT doc_id,
          lower(regexp_extract(nofrag, '^([^:]*)://', 1)) AS scheme,
          regexp_extract(nofrag, '^[^:]*://([^/?]*)', 1) AS hostport,
          regexp_replace(
            regexp_extract(nofrag, '^[^:]*://[^/?]*([^?]*)', 1),
            '/+$$', '') AS path,
          CASE WHEN contains(nofrag, '?')
               THEN regexp_extract(nofrag, '\\?(.*)$$', 1) ELSE '' END AS query
        FROM p1),
      p3 AS (SELECT doc_id, scheme, path, query,
          CASE WHEN regexp_matches(hostport, ':[0-9]+$$')
               THEN lower(regexp_replace(hostport, ':[0-9]+$$', ''))
               ELSE lower(hostport) END AS host0,
          regexp_extract(hostport, ':([0-9]+)$$', 1) AS port
        FROM p2),
      p4 AS (SELECT doc_id, scheme, path,
          CASE WHEN starts_with(host0, 'www.') THEN substr(host0, 5)
               ELSE host0 END AS host,
          CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                 OR (scheme = 'https' AND port = '443')
               THEN '' ELSE ':' || port END AS keepport,
          list_sort(list_filter(string_split(query, '&'), p ->
            len(p) > 0
            AND NOT starts_with(regexp_extract(p, '^([^=]*)', 1), 'utm_')
            AND NOT list_contains(
              ['gclid','fbclid','msclkid','mc_cid','mc_eid','ref',
               'ref_src','igshid','spm','yclid'],
              regexp_extract(p, '^([^=]*)', 1)))) AS params
        FROM p3),
      canon AS (SELECT doc_id,
          scheme || '://' || host || keepport || path ||
          CASE WHEN len(params) > 0
               THEN '?' || array_to_string(params, '&') ELSE '' END AS url
        FROM p4)
      SELECT min(doc_id) AS doc_id, url, count(*) AS n_dups
      FROM canon GROUP BY url""")),

    // Distributed k-means (Lloyd, 3 rounds, k=8) in fixed-point integer
    // arithmetic — the centroid TRAINER behind IVF/SemDeDup (their
    // splitmix sample is this at iters=0). Quantization makes every
    // distance/sum/mean an exact integer, so the oracle replays the whole
    // fit (init sample, 3 unrolled Lloyd rounds, final assignment)
    // bit-exactly, and the fit is partitioning-independent — the
    // reproducibility property that matters at 100 TB.
    Query("q77_kmeans",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val cents = graft.operators.ClusteringOps.kmeansFit(e, k = 8, iters = 3)
        graft.operators.ClusteringOps.kmeansAssign(e, cents)
          .select(col("vec_id"), col("cid").cast("long").as("cid"))
      },
      Some(HashOracleSql.kmeansSql(k = 8, iters = 3, dim = 64, scale = 1L << 20))),

    // Deterministic train/val/test split: assignment is a pure hash of the
    // row key against cumulative fraction bounds — stable across runs,
    // retries, cluster sizes and corpus growth (unlike randomSplit). The
    // oracle restates the EXACT left-to-right accumulated double bounds
    // (hashSplitBounds), not the nominal fractions, so both engines compare
    // against bit-identical constants.
    Query("q78_hash_split",
      (s, dir) => SamplingOps.hashSplit(
        t(s, dir, "documents"),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
        salt = "split")
        .select(col("doc_id"), col("split")),
      Some {
        val bounds = SamplingOps.hashSplitBounds(
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        val cases = bounds.dropRight(1).map { case (name, b) =>
          s"WHEN u < CAST('$b' AS DOUBLE) THEN '$name'"
        }.mkString(" ")
        s"""WITH u AS (SELECT doc_id,
             ${HashOracleSql.uniformSql("doc_id::VARCHAR", "split")} AS u
           FROM documents)
           SELECT doc_id, CASE $cases ELSE '${bounds.last._1}' END AS split
           FROM u"""
      }),

    // Dedup-aware (leak-safe) split: hashSplit keyed by the near-dup
    // CLUSTER, so a test doc's near-copy can never train — the
    // split-contamination guard benchmark papers mandate. Oracle replays
    // banding, the recursive-CTE closure, and the hash assignment.
    Query("q125_leak_safe_split",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val pairs = DedupOps.minhashNearDuplicates(
          d, "doc_id", "text",
          numHashes = 64, shingleN = 3, bands = 16, threshold = 0.5)
          .select("id_a", "id_b")
        SamplingOps.leakSafeSplit(
          d.select(col("doc_id")), "doc_id", pairs,
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
          salt = "leaksplit")
          .select(col("doc_id"), col("cluster_key"), col("split"))
      },
      Some {
        val bounds = SamplingOps.hashSplitBounds(
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        val cases = bounds.dropRight(1).map { case (name, b) =>
          s"WHEN u < CAST('$b' AS DOUBLE) THEN '$name'"
        }.mkString(" ")
        s"""WITH RECURSIVE prs AS MATERIALIZED (
           |  SELECT id_a, id_b FROM (
           |${HashOracleSql.minhashNearDupSql(
              numHashes = 64, shingleN = 3, bands = 16, threshold = 0.5)}
           |  ) mh),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
           |          UNION SELECT id_b, id_a FROM prs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id),
           |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
           |k AS (SELECT d.doc_id,
           |    coalesce(cl.cluster_id, d.doc_id) AS cluster_key
           |  FROM documents d LEFT JOIN cl ON cl.id = d.doc_id),
           |u AS (SELECT doc_id, cluster_key,
           |    ${HashOracleSql.uniformSql("cluster_key::VARCHAR",
                  "leaksplit")} AS u
           |  FROM k)
           |SELECT doc_id, cluster_key,
           |  CASE $cases ELSE '${bounds.last._1}' END AS split
           |FROM u""".stripMargin
      }),

    // Decontamination REPORT with a fraction threshold: per corpus doc its
    // distinct 5-grams, benchmark-shared grams, and contaminated verdict at
    // >17% overlap — the form the published test-set-overlap filters apply
    // (absolute hit counts over-flag long docs). Same corpus/benchmark
    // carve as q43.
    Query("q79_decontam_report",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 20 === 0)
          .select(col("text").as("bench_text"))
        val corpus = docs.filter(col("doc_id") % 20 =!= 0)
        TextOps.contaminationReport(corpus, bench, "doc_id", "text",
          "bench_text", ngramN = 5, maxFraction = 0.17)
      },
      Some(s"""WITH ${HashOracleSql.shingleCtes(5)},
        bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
        corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0),
        agg AS (
          SELECT c.doc_id, count(*) AS n_grams, count(b.g) AS n_hits
          FROM corpus c LEFT JOIN bench b ON c.g = b.g
          GROUP BY c.doc_id)
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
          CAST(n_hits AS BIGINT) AS n_hits,
          n_hits > 0.17 * n_grams AS contaminated
        FROM agg""")),

    // Temperature-scaled language mixture (XLM-R/mT5-style): keep-rates
    // realize w_l ∝ n_l^0.5 over an expected 250-row budget, up-weighting
    // low-resource languages. The per-stratum pow is quantized to integer
    // 1e-6 units BEFORE normalization, so the oracle's arithmetic is exact
    // integer + pure IEEE division — libm pow ulp drift cannot surface.
    Query("q80_temperature_mix",
      (s, dir) => SamplingOps.temperatureMix(
        t(s, dir, "documents"), "lang", "doc_id", alpha = 0.5,
        targetRows = 250L, salt = "temp")
        .select(col("doc_id"), col("lang")),
      Some(s"""WITH counts AS (
          SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        pw AS (SELECT lang, n,
          CAST(floor(pow(n::DOUBLE, 0.5) * 1000000.0 + 0.5) AS BIGINT) AS pwq
          FROM counts),
        tot AS (SELECT sum(pwq) AS t FROM pw),
        rates AS (SELECT lang,
          least(1.0, (pwq::DOUBLE / t::DOUBLE) * 250.0 / n::DOUBLE) AS rate
          FROM pw, tot)
        SELECT d.doc_id, d.lang FROM documents d JOIN rates r USING (lang)
        WHERE ${HashOracleSql.uniformSql("d.doc_id::VARCHAR", "temp")} < r.rate""")),

    // RefinedWeb-style CROSS-document line dedup: lines occurring in >= 3
    // distinct docs (injected boilerplate: footer in every doc, a
    // newsletter banner in 1/4 of docs) are removed everywhere; the
    // doc-unique content lines survive in order. The testdata's texts are
    // single-line, so the multi-line pages are composed in-plan (same
    // technique as q57/q59) and the oracle replays the composition.
    Query("q81_global_line_dedup",
      (s, dir) => {
        val d = col("doc_id")
        val composed = t(s, dir, "documents").select(
          d, concat_ws("\n",
            col("text").substr(lit(1), lit(40)),
            when(d % 4 === 0, lit("subscribe to our newsletter"))
              .otherwise(col("text").substr(lit(5), lit(40))),
            concat(lit("copyright "), (d % 2).cast("string"))).as("text"))
        TextOps.globalLineDedup(composed, "doc_id", "text", minDocs = 3)
      },
      Some("""WITH comp AS (
          SELECT doc_id,
            substr(text, 1, 40) || chr(10) ||
            CASE WHEN doc_id % 4 = 0 THEN 'subscribe to our newsletter'
                 ELSE substr(text, 5, 40) END || chr(10) ||
            'copyright ' || CAST(doc_id % 2 AS VARCHAR) AS text
          FROM documents),
        sp AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM comp),
        idx AS (SELECT doc_id, ls,
                  unnest(generate_series(1, len(ls))) AS j FROM sp),
        lines AS (SELECT doc_id, j, ls[j] AS line FROM idx),
        banned AS (
          SELECT line FROM (SELECT DISTINCT line, doc_id FROM lines)
          GROUP BY line HAVING count(*) >= 3),
        flags AS (
          SELECT l.doc_id, l.j, l.line, b.line IS NOT NULL AS bad
          FROM lines l LEFT JOIN banned b ON l.line = b.line)
        SELECT doc_id,
          COALESCE(string_agg(CASE WHEN NOT bad THEN line END,
            chr(10) ORDER BY j), '') AS cleaned_text,
          CAST(count(*) FILTER (WHERE bad) AS BIGINT) AS n_removed
        FROM flags GROUP BY doc_id""")),

    // Sliding-window character chunking (size 120, stride 80): the
    // context-window splitter of a RAG/training pipeline, on the REAL
    // document texts. Chunk boundaries are pure integer arithmetic; the
    // oracle replays count + substr per chunk.
    Query("q82_chunk_stride",
      (s, dir) => TextOps.chunkDocuments(
        t(s, dir, "documents"), "doc_id", "text", size = 120, stride = 80),
      Some("""WITH n AS (
          SELECT doc_id, text,
            (greatest(length(text) - 120, 0) + 79) // 80 AS lastc
          FROM documents),
        i AS (SELECT doc_id, text,
                unnest(generate_series(0, lastc)) AS chunk_id FROM n)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
          substr(text, CAST(chunk_id * 80 + 1 AS INTEGER), 120) AS chunk_text,
          CAST(length(substr(text, CAST(chunk_id * 80 + 1 AS INTEGER), 120))
            AS BIGINT) AS chunk_len
        FROM i""")),

    // PMI collocation mining over the real texts: adjacent lowercase
    // alphanumeric bigrams with count >= 5, scored
    // ln((c12/B)*(T/c1)*(T/c2)) in quantized 1e-7 units (q63's
    // fixed-association technique), top 50 by (pmi_q desc, w1, w2).
    Query("q83_collocations_pmi",
      (s, dir) => TextOps.collocationsPmi(
        t(s, dir, "documents"), "text", minCount = 5L, k = 50),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '') AS ts
          FROM documents),
        bgi AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
                FROM toks WHERE len(ts) >= 2),
        bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2 FROM bgi),
        cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
               FROM bg GROUP BY w1, w2 HAVING count(*) >= 5),
        uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w),
        tot AS (SELECT CAST(sum(len(ts)) AS BIGINT) AS t_toks,
                  CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS t_bgs
                FROM toks)
        SELECT w1, w2, c12,
          CAST(floor(ln(
            (CAST(c12 AS DOUBLE) / t_bgs) *
            (CAST(t_toks AS DOUBLE) / u1.cu) *
            (CAST(t_toks AS DOUBLE) / u2.cu)) * 1e7 + 0.5) AS BIGINT)
            AS pmi_q
        FROM cb
        JOIN uni u1 ON cb.w1 = u1.w
        JOIN uni u2 ON cb.w2 = u2.w
        CROSS JOIN tot
        ORDER BY pmi_q DESC, w1, w2 LIMIT 50""")),

    // Edit-distance near-dup join via PassJoin segment blocking (never
    // all-pairs): each 4-doc group shares a base drawn from the GROUP
    // REPRESENTATIVE's real text (doc-unique across groups — unlike
    // composed numeric keys, whose dense id space makes every id a
    // digit-edit neighbor of hundreds of others and the TRUE pair set
    // quadratic), carrying a 1-append variant, a 1-substitution variant
    // and a far (reversed) string. The oracle verifies by brute force;
    // the operator's pigeonhole candidates + levenshtein verify must find
    // exactly the same pair set.
    Query("q84_edit_distance_neardup",
      (s, dir) => {
        val d = col("doc_id")
        val docs0 = t(s, dir, "documents").select(d, col("text"))
        val reps = docs0.filter(d % 4 === 0)
          .select(expr("doc_id div 4").as("g"),
            col("text").substr(lit(1), lit(24)).as("base"))
        val composed = docs0
          .select(d, expr("doc_id div 4").as("g"))
          .join(reps, "g")
          .select(d,
            when(d % 4 === 0, col("base"))
              .when(d % 4 === 1, concat(col("base"), lit("x")))
              .when(d % 4 === 2, concat(col("base").substr(lit(1), lit(10)),
                lit("Q"), col("base").substr(lit(12), lit(13))))
              .otherwise(reverse(col("base"))).as("s"))
        DedupOps.editDistanceNearDuplicates(composed, "doc_id", "s",
          maxDist = 2)
      },
      Some("""WITH reps AS (
          SELECT doc_id // 4 AS g, substr(text, 1, 24) AS base
          FROM documents WHERE doc_id % 4 = 0),
        c AS (
          SELECT d.doc_id,
            CASE d.doc_id % 4
              WHEN 0 THEN r.base
              WHEN 1 THEN r.base || 'x'
              WHEN 2 THEN substr(r.base, 1, 10) || 'Q' || substr(r.base, 12, 13)
              ELSE reverse(r.base)
            END AS s
          FROM documents d JOIN reps r ON d.doc_id // 4 = r.g)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        FROM c a JOIN c b
          ON a.doc_id < b.doc_id
          AND abs(length(a.s) - length(b.s)) <= 2
          AND levenshtein(a.s, b.s) <= 2""")),

    // Per-document TF-IDF keywords: top-3 characteristic terms per doc,
    // quantized smoothed idf (q63's ln technique), (score desc, term)
    // tie-break so the per-doc rank replays exactly.
    Query("q87_tfidf_keywords",
      (s, dir) => TextOps.tfidfKeywords(
        t(s, dir, "documents"), "doc_id", "text", k = 3),
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, term),
        dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY term),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf,
            CAST(floor(
              CAST(tf.tf AS DOUBLE) *
              ln((CAST(n_docs AS DOUBLE) + 1.0) / (df + 1.0)) *
              1e7 + 0.5) AS BIGINT) AS tfidf_q
          FROM tf JOIN dfs USING (term) CROSS JOIN nd),
        ranked AS (
          SELECT doc_id, term, tf, tfidf_q,
            CAST(row_number() OVER (
              PARTITION BY doc_id ORDER BY tfidf_q DESC, term)
              AS INTEGER) AS rank
          FROM scored)
        SELECT * FROM ranked WHERE rank <= 3""")),

    // Zipf rank-frequency diagnostic: least-squares slope of
    // (ln rank, ln count) over the vocabulary, quantized 1e-4 integer
    // sums -> one exact double division. Healthy natural text ~ -1.
    Query("q88_zipf_fit",
      (s, dir) => TextOps.zipfFit(t(s, dir, "documents"), "text"),
      Some("""WITH toks AS (
          SELECT unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS token
          FROM documents),
        freqs AS (SELECT token, CAST(count(*) AS BIGINT) AS n
                  FROM toks GROUP BY token),
        xy AS (
          SELECT n,
            CAST(floor(ln(CAST(row_number() OVER (ORDER BY n DESC, token)
              AS DOUBLE)) * 1e4 + 0.5) AS BIGINT) AS x,
            CAST(floor(ln(CAST(n AS DOUBLE)) * 1e4 + 0.5) AS BIGINT) AS y
          FROM freqs),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n_types,
            CAST(sum(n) AS BIGINT) AS n_tokens,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x * y) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx
          FROM xy)
        SELECT n_types, n_tokens,
          n_types * sxy - sx * sy AS num,
          n_types * sxx - sx * sx AS den,
          CASE WHEN n_types * sxx - sx * sx = 0 THEN 0.0
            ELSE CAST(n_types * sxy - sx * sy AS DOUBLE) /
              CAST(n_types * sxx - sx * sx AS DOUBLE) END AS slope
        FROM s""")),

    // Containment (subset) similarity join: quote documents (each a
    // word-suffix of its source, so its shingles embed verbatim) carry
    // near-zero JACCARD against the source but containment ~1 — the
    // asymmetric prefix-filter candidates must find exactly the pairs the
    // brute-force oracle finds.
    Query("q89_containment_join",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val quotes = d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            array_join(
              slice(filter(split(col("text"), "\\s+"), w => w =!= ""),
                8, 100000), " ").as("text"))
        DedupOps.containmentJoin(d.unionByName(quotes), "doc_id", "text",
          shingleN = 3, threshold = 0.9)
      },
      Some("""WITH raw AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
            array_to_string(
              (list_filter(string_split_regex(text, '\s+'),
                x -> x <> ''))[8:], ' ') AS text
          FROM documents WHERE doc_id % 3 = 0),
        toks AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'),
              x -> x <> '') AS t
          FROM raw),
        sh AS (
          SELECT doc_id,
            list_distinct(CASE
              WHEN len(t) = 0 THEN []
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                    for i in generate_series(1, len(t)-2)]
            END) AS s
          FROM toks),
        ex AS (SELECT doc_id, unnest(s) AS tok FROM sh),
        sizes AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
          CAST(n_inter AS DOUBLE) / sa.n AS c_a,
          CAST(n_inter AS DOUBLE) / sb.n AS c_b
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE greatest(CAST(n_inter AS DOUBLE) / sa.n,
                       CAST(n_inter AS DOUBLE) / sb.n) >= 0.9""")),

    // Incremental corpus refresh: the old snapshot is the corpus minus the
    // last decile, with deciles 3-4 truncated to half length (simulated
    // edits); the new snapshot drops decile 0. The delta classifies every
    // doc added/deleted/changed/unchanged via constant-width fingerprints
    // — the incremental-rebuild driver of production corpus refreshes.
    Query("q126_snapshot_delta",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val old = d.filter(col("doc_id") % 10 < 8)
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 4,
              expr("substring(text, 1, int(greatest(1, n_chars div 2)))"))
              .otherwise(col("text")).as("text"))
        val nw = d.filter(col("doc_id") % 10 >= 1)
          .select(col("doc_id"), col("source"), col("text"))
        graft.operators.SnapshotOps.snapshotDelta(
          old, nw, "doc_id", "text", carryCols = Seq("source"))
      },
      Some("""WITH fp AS (
          SELECT doc_id, source,
            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS full_fp,
            md5(lower(regexp_replace(trim(
              substr(text, 1, greatest(1, n_chars // 2))), '\s+', ' ', 'g')))
              AS half_fp
          FROM documents),
        old AS (
          SELECT doc_id, source,
            CASE WHEN doc_id % 10 IN (3, 4) THEN half_fp ELSE full_fp END AS fp
          FROM fp WHERE doc_id % 10 < 8),
        nw AS (
          SELECT doc_id, source, full_fp AS fp FROM fp WHERE doc_id % 10 >= 1)
        SELECT coalesce(nw.doc_id, old.doc_id) AS doc_id,
          coalesce(nw.source, old.source) AS source,
          CASE WHEN old.doc_id IS NULL THEN 'added'
               WHEN nw.doc_id IS NULL THEN 'deleted'
               WHEN old.fp = nw.fp THEN 'unchanged'
               ELSE 'changed' END AS status
        FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id""")),

    // Token-budget selection: the best 10k tokens by (score DESC, id)
    // greedy prefix — how a pretraining run is actually sized. The global
    // ordered cumulative sum is the TWO-PHASE range-partition + offset
    // plan (never a single-partition window); the oracle is the plain
    // window cumsum it must equal.
    Query("q127_token_budget_select",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            ((col("doc_id") * 2654435761L) % 1000).as("score"),
            TextOps.tokenCount(col("text")).as("toks"))
        SamplingOps.budgetSelect(d, "doc_id", "score", "toks",
          budget = 10000L)
      },
      Some("""WITH sc AS (
          SELECT doc_id, (doc_id * 2654435761) % 1000 AS score,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\s+'))
            END AS tokens
          FROM documents)
        SELECT doc_id, score, CAST(tokens AS BIGINT) AS tokens,
          CAST(sum(tokens) OVER (ORDER BY score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens,
          CAST(sum(tokens) OVER (ORDER BY score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            <= 10000 AS selected
        FROM sc""")),

    // Per-source quality calibration: scores are ranked WITHIN each
    // source ((r-1)/n percentile, int/int IEEE division) and the top 30%
    // of EVERY source is selected — the domain-balanced alternative to a
    // global score threshold that starves whole domains.
    Query("q128_calibrated_quality_select",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            ((col("doc_id") * 2654435761L) % 1000).as("score"))
        SamplingOps.calibratedSelect(d, "source", "doc_id", "score",
          keepFraction = 0.3)
      },
      Some("""WITH sc AS (
          SELECT source, doc_id, (doc_id * 2654435761) % 1000 AS score
          FROM documents),
        r AS (
          SELECT source, doc_id, score,
            row_number() OVER (PARTITION BY source
              ORDER BY score DESC, doc_id) AS rn,
            count(*) OVER (PARTITION BY source) AS n
          FROM sc)
        SELECT source, doc_id, score,
          CAST(rn - 1 AS DOUBLE) / CAST(n AS DOUBLE) AS calibrated,
          CAST(rn - 1 AS DOUBLE) < CAST(n AS DOUBLE) * 0.3 AS selected
        FROM r""")),

    // Domain-scoped boilerplate removal: paragraphs composed in-plan so
    // each source shares a footer and a parity-keyed nav line (template
    // chrome) around a unique body; every occurrence of a paragraph seen
    // in >= 3 docs of the SAME source is removed (unlike keep-first
    // dedup), with per-doc removal accounting.
    Query("q131_boilerplate_removal",
      (s, dir) => {
        val composed = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          concat_ws("\n\n",
            concat(lit("footer "), col("source")),
            concat(lit("body "), col("doc_id").cast("string")),
            concat(lit("nav "), col("source"), lit(" "),
              (col("doc_id") % 2).cast("string"))).as("text"))
        DedupOps.removeBoilerplate(
          composed, "doc_id", "text", "source", minDocs = 3)
      },
      Some("""WITH paras AS (
          SELECT doc_id, source, k,
            CASE k WHEN 0 THEN 'footer ' || source
                   WHEN 1 THEN 'body ' || CAST(doc_id AS VARCHAR)
                   ELSE 'nav ' || source || ' ' || CAST(doc_id % 2 AS VARCHAR)
            END AS para
          FROM documents, unnest(generate_series(0, 2)) AS t(k)),
        df AS (
          SELECT source, para, count(DISTINCT doc_id) AS nd
          FROM paras GROUP BY source, para),
        marked AS (
          SELECT p.doc_id, p.source, p.k, p.para,
            (df.nd >= 3) AS boiler
          FROM paras p JOIN df ON df.source = p.source AND df.para = p.para)
        SELECT doc_id, source,
          coalesce(string_agg(CASE WHEN NOT boiler THEN para END,
            chr(10) || chr(10) ORDER BY k), '') AS text,
          CAST(count(*) FILTER (WHERE boiler) AS BIGINT) AS n_removed_paras,
          CAST(coalesce(sum(length(para)) FILTER (WHERE boiler), 0) AS BIGINT)
            AS removed_chars
        FROM marked GROUP BY doc_id, source""")),

    // Global equal-depth length tiers (exact ANSI NTILE(10) on token
    // count) WITHOUT the single-partition sort the window form costs: the
    // rank is the two-phase range-partition + broadcast-offsets plan. The
    // oracle is DuckDB's own ntile — an independent implementation of the
    // same ANSI semantics.
    Query("q132_length_deciles",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("tokens"))
        graft.operators.Quantiles.globalNtile(d, "tokens", "doc_id", n = 10)
          // DuckDB's ntile returns BIGINT; match the schema exactly
          .withColumn("bucket", col("bucket").cast("long"))
      },
      Some("""WITH sc AS (
          SELECT doc_id,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\s+'))
            END AS BIGINT) AS tokens
          FROM documents)
        SELECT doc_id, tokens,
          ntile(10) OVER (ORDER BY tokens, doc_id) AS bucket
        FROM sc""")),

    // Per-source novelty attribution under alphabetical ingestion order:
    // what each source ADDS after global exact dedup — docs, distinct
    // fingerprints, first-seen-here fingerprints, novelty rate. The
    // mixture curator's "is this crawl worth its storage" report.
    Query("q134_source_novelty",
      (s, dir) => graft.operators.CorpusCompareOps.sourceNovelty(
        t(s, dir, "documents"), "text", "source"),
      Some("""WITH fp AS (
          SELECT source,
            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM fp GROUP BY 1),
        pairs AS MATERIALIZED (SELECT DISTINCT source, fp FROM fp),
        ndist AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
          FROM pairs GROUP BY 1),
        nv AS (SELECT source, CAST(count(*) AS BIGINT) AS n_novel FROM (
            SELECT fp, min(source) AS source FROM pairs GROUP BY 1)
          GROUP BY 1)
        SELECT n.source, n.n_docs,
          coalesce(d.n_distinct, 0) AS n_distinct,
          coalesce(v.n_novel, 0) AS n_novel,
          CAST(coalesce(v.n_novel, 0) AS DOUBLE) /
            CAST(n.n_docs AS DOUBLE) AS novelty_rate
        FROM nd n LEFT JOIN ndist d USING (source)
        LEFT JOIN nv v USING (source)""")),

    // Pairwise source similarity: cosine between hashed unigram count
    // vectors — "are these two crawls the same distribution" for mixture
    // weighting. Dot/norms in DECIMAL(38,0) (HUGEINT), one deterministic
    // double chain per cosine.
    Query("q135_source_similarity",
      (s, dir) => graft.operators.CorpusCompareOps.sourceSimilarity(
        t(s, dir, "documents"), "text", "source", buckets = 4096),
      Some(s"""WITH tok AS (SELECT source,
          |    unnest(list_filter(
          |      string_split_regex(lower(text), '[^a-z0-9]+'),
          |      x -> x <> '')) AS tok
          |  FROM documents),
          |hh AS (SELECT source, ${HashOracleSql.fnv1a64("tok")} AS h
          |  FROM tok),
          |cb AS MATERIALIZED (SELECT source,
          |    ${HashOracleSql.bucketSql(4096)} AS b,
          |    CAST(count(*) AS BIGINT) AS c
          |  FROM hh GROUP BY 1, 2),
          |nrm AS (SELECT source, sum(c::HUGEINT * c::HUGEINT) AS nrm
          |  FROM cb GROUP BY 1),
          |pr AS (SELECT a.source AS src_a, b.source AS src_b,
          |    sum(a.c::HUGEINT * b.c::HUGEINT) AS dot,
          |    CAST(count(*) AS BIGINT) AS n_shared_buckets
          |  FROM cb a JOIN cb b ON a.b = b.b AND a.source < b.source
          |  GROUP BY 1, 2)
          |SELECT src_a, src_b, n_shared_buckets,
          |  CAST(dot AS DOUBLE) /
          |    (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
          |    AS cosine
          |FROM pr JOIN nrm na ON na.source = pr.src_a
          |JOIN nrm nb ON nb.source = pr.src_b""".stripMargin)),

    // Chi-square feature-label association over the FULL labels x buckets
    // grid (absent cells contribute their expected mass): the top-50
    // source-discriminative hashed token buckets. Each cell quantizes its
    // (o-e)^2/e to 1e-6 once; the statistic is then an exact LONG sum.
    Query("q136_chi2_features",
      (s, dir) => graft.operators.CorpusCompareOps.chiSquareFeatures(
        t(s, dir, "documents"), "source", "text", buckets = 4096, k = 50),
      Some(s"""WITH tok AS (SELECT source,
          |    unnest(list_filter(
          |      string_split_regex(lower(text), '[^a-z0-9]+'),
          |      x -> x <> '')) AS tok
          |  FROM documents),
          |hh AS (SELECT source, ${HashOracleSql.fnv1a64("tok")} AS h
          |  FROM tok),
          |obs AS MATERIALIZED (SELECT source AS label,
          |    CAST(${HashOracleSql.bucketSql(4096)} AS BIGINT) AS b,
          |    CAST(count(*) AS BIGINT) AS o
          |  FROM hh GROUP BY 1, 2),
          |rt AS (SELECT label, CAST(sum(o) AS BIGINT) AS rt
          |  FROM obs GROUP BY 1),
          |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct
          |  FROM obs GROUP BY 1),
          |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
          |grid AS (SELECT r.label, c.b, r.rt, c.ct,
          |    (SELECT n FROM nn) AS n, coalesce(o.o, 0) AS o
          |  FROM rt r CROSS JOIN ct c
          |  LEFT JOIN obs o ON o.label = r.label AND o.b = c.b),
          |cells AS (SELECT b, CAST(floor(
          |    (CAST(o AS DOUBLE)
          |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
          |         / CAST(n AS DOUBLE))
          |    * (CAST(o AS DOUBLE)
          |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
          |         / CAST(n AS DOUBLE))
          |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
          |       / CAST(n AS DOUBLE))
          |    * 1e6 + 0.5) AS BIGINT) AS cq
          |  FROM grid)
          |SELECT b, CAST(sum(cq) AS BIGINT) AS chi2_q
          |FROM cells GROUP BY 1
          |ORDER BY chi2_q DESC, b LIMIT 50""".stripMargin)),

    // Reciprocal-rank fusion of two BM25 query expansions — score-free
    // ranking combination in pure integer arithmetic (1e12 div (k+rank)).
    // Each ranking is a bounded top-200 TakeOrdered; the single-partition
    // rank window runs over those 200 rows only.
    Query("q137_rrf_fusion",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        def ranked(terms: Seq[String]): org.apache.spark.sql.DataFrame =
          TextOps.bm25Scores(docs, "doc_id", "text", terms)
            .orderBy(col("bm25_q").desc, col("doc_id")).limit(200)
            .withColumn("rank", row_number().over(
              Window.orderBy(col("bm25_q").desc, col("doc_id")))
              .cast("long"))
            .select("doc_id", "rank")
        graft.operators.RankFusionOps.rrfFuse(
          ranked(Seq("spark", "hash", "window", "merge", "dup")),
          ranked(Seq("join", "sort", "query", "stream", "filter")),
          "doc_id", "rank", k = 60, topN = 100)
      },
      Some(s"""WITH toks AS (
          |  SELECT doc_id, list_filter(
          |    string_split_regex(lower(text), '[^a-z0-9]+'),
          |    x -> x <> '') AS ts
          |  FROM documents),
          |dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
          |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |                 CAST(sum(dl) AS BIGINT) AS dlsum FROM dl),
          |${bm25RankCte("a", Seq("spark", "hash", "window", "merge", "dup"))},
          |${bm25RankCte("b", Seq("join", "sort", "query", "stream", "filter"))}
          |SELECT doc_id,
          |  CAST(coalesce(1000000000000::BIGINT // (rank_a + 60), 0)
          |     + coalesce(1000000000000::BIGINT // (rank_b + 60), 0) AS BIGINT)
          |    AS rrf_q,
          |  rank_a, rank_b
          |FROM ra FULL OUTER JOIN rb USING (doc_id)
          |ORDER BY rrf_q DESC, doc_id LIMIT 100""".stripMargin)),

    // Per-source Gini concentration of token mass: "is this source
    // dominated by a few huge documents". Keyed rank window + DECIMAL
    // aggregates; one double chain per group.
    Query("q138_source_gini",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("tokens"))
        graft.operators.Stats.giniByGroup(d, "source", "tokens", "doc_id")
      },
      Some("""WITH sc AS (
          SELECT source, doc_id,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\s+'))
            END AS BIGINT) AS tokens
          FROM documents),
        r AS (SELECT source, tokens AS x, row_number() OVER (
            PARTITION BY source ORDER BY tokens, doc_id) AS i
          FROM sc),
        g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            sum(x::HUGEINT) AS s, sum(i::HUGEINT * x::HUGEINT) AS six
          FROM r GROUP BY 1)
        SELECT source, n_docs, CAST(s AS BIGINT) AS total,
          CASE WHEN s = 0 THEN 0.0 ELSE
            (2.0 * CAST(six AS DOUBLE)
              - (CAST(n_docs AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))
            / (CAST(n_docs AS DOUBLE) * CAST(s AS DOUBLE)) END AS gini
        FROM g""")),

    // Grouped top-k: the 3 longest documents per source — written as the
    // declarative rank<=k filter so Spark's WindowGroupLimit pushes the
    // per-group limit below the shuffle (PlanSpec-pinned).
    Query("q139_top_docs_per_source",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("tokens"))
          .withColumn("rn", row_number().over(Window.partitionBy("source")
            .orderBy(col("tokens").desc, col("doc_id"))).cast("long"))
          .filter(col("rn") <= 3)
      },
      Some("""WITH sc AS (
          SELECT source, doc_id,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\s+'))
            END AS BIGINT) AS tokens
          FROM documents)
        SELECT source, doc_id, tokens, rn FROM (
          SELECT source, doc_id, tokens, row_number() OVER (
              PARTITION BY source ORDER BY tokens DESC, doc_id) AS rn
          FROM sc) WHERE rn <= 3""")),

    // Wilson lower-bound quality ranking: rank sources by the fraction
    // of docs passing the >=50-token gate, small-sample corrected (a 2/2
    // source must not outrank 950/1000). One aggregation; the bound is
    // one fixed double chain over exact (n, k), restated verbatim in SQL.
    Query("q142_wilson_quality_rank",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("source"),
            (TextOps.tokenCount(col("text")).cast("long") >= 50)
              .as("pass"))
        graft.operators.Stats.wilsonRanking(d, "source", "pass", z = 1.96)
      },
      Some("""WITH sc AS (
          SELECT source,
            (CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_split_to_array(trim(text), '\s+'))
            END AS BIGINT) >= 50) AS pass
          FROM documents),
        a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
              AS n_pass
          FROM sc GROUP BY 1)
        SELECT source, n_docs, n_pass,
          ((CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))
            + (1.96 * 1.96) / (CAST(n_docs AS DOUBLE) * 2.0)
            - 1.96 * sqrt(
                (CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))
                  * (1.0 - (CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)))
                  / CAST(n_docs AS DOUBLE)
                + (1.96 * 1.96)
                  / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) * 4.0)))
          / (1.0 + (1.96 * 1.96) / CAST(n_docs AS DOUBLE)) AS wilson_lb
        FROM a""")),

    // Snapshot data-quality profile of the documents table: per-column
    // completeness, exact cardinality, blank-string count — ONE
    // aggregation pass (Expand), stacked to long format.
    Query("q143_table_profile",
      (s, dir) => graft.operators.ProfileOps.profileColumns(
        t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars")),
      Some(Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        val blank =
          if (c == "text" || c == "lang" || c == "source")
            s"CAST(sum(CASE WHEN trim($c) = '' THEN 1 ELSE 0 END) AS BIGINT)"
          else "CAST(0 AS BIGINT)"
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $blank AS n_blank
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n"))),

    // Budget-constrained mixture allocation (water-filling): spend half
    // the corpus's char mass across sources proportionally to a weight,
    // capping at availability and redistributing surplus. The oracle
    // restates the exact closed form: capped sources are a prefix of the
    // avail/weight order, cut at the first exact cross-product failure.
    Query("q152_waterfill_mixture",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val counts = docs.groupBy("source")
          .agg(sum("n_chars").as("available"))
          .withColumn("weight",
            pmod(expr("CAST(substr(source, 4, 10) AS INT)"), lit(4)) + 1)
        // budget = floor(total/2) folded INTO the plan (fraction
        // overload) — no eager driver-side sum before the allocation
        graft.operators.SamplingOps.waterFillAllocation(
          counts, "source", "available", "weight",
          budgetNum = 1L, budgetDen = 2L)
      },
      Some("""WITH counts AS (
          SELECT source, CAST(sum(n_chars) AS HUGEINT) AS a,
            CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS HUGEINT) AS w
          FROM documents GROUP BY 1),
        b AS (SELECT CAST(sum(a) // 2 AS HUGEINT) AS budget FROM counts),
        ord AS (SELECT source, a, w,
            row_number() OVER (
              ORDER BY CAST(a AS DOUBLE)/CAST(w AS DOUBLE), source) AS rk,
            coalesce(sum(a) OVER (
              ORDER BY CAST(a AS DOUBLE)/CAST(w AS DOUBLE), source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pa,
            coalesce(sum(w) OVER (
              ORDER BY CAST(a AS DOUBLE)/CAST(w AS DOUBLE), source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pw
          FROM counts),
        tot AS (SELECT sum(w) AS tw FROM counts),
        flag AS (SELECT ord.*,
            (a * (tw - pw) <= (budget - pa) * w) AS would_cap
          FROM ord, tot, b),
        cut AS (SELECT min(CASE WHEN NOT would_cap THEN rk END) AS cutrk
          FROM flag),
        lab AS (SELECT flag.*,
            (cutrk IS NULL OR rk < cutrk) AS capped FROM flag, cut),
        rem AS (SELECT
            (SELECT budget FROM b)
              - coalesce(sum(CASE WHEN capped THEN a END), 0) AS bs,
            coalesce(sum(CASE WHEN NOT capped THEN w END), 0) AS ws
          FROM lab)
        SELECT source, CAST(a AS BIGINT) AS available,
          CAST(w AS BIGINT) AS weight, capped,
          CAST(CASE WHEN capped THEN a ELSE (bs * w) // ws END AS BIGINT)
            AS allocated
        FROM lab, rem""")),

    // Size-balanced shard packing report: rank docs by char mass
    // descending (two-phase global rank, no single-partition sort) and
    // deal serpentine onto 8 shards; the report proves the pack is tight.
    Query("q153_balanced_shards",
      (s, dir) => graft.operators.ShardOps.shardReport(
        t(s, dir, "documents"), "n_chars", "doc_id", nShards = 8),
      Some("""WITH r AS (
          SELECT n_chars,
            row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS idx
          FROM documents)
        SELECT CAST(CASE WHEN (idx // 8) % 2 = 0 THEN idx % 8
            ELSE 7 - (idx % 8) END AS INT) AS shard,
          CAST(count(*) AS BIGINT) AS n_items,
          CAST(sum(n_chars) AS BIGINT) AS total_size
        FROM r GROUP BY 1""")),

    // Incremental cluster maintenance: the q42 star clustering as the
    // EXISTING labels, the chain pairs as the new batch — mergeClusters
    // runs CC over labels-as-edges + new pairs (never replaying the
    // historical pair join) and must equal the from-scratch closure, so
    // the oracle is exactly q42's recursive CTE over star UNION chain.
    Query("q160_merge_clusters",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val star = c.filter(col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey").as("id_a"),
            (col("c_custkey") - col("c_custkey") % 5).as("id_b"))
        val chain = c.filter(col("c_custkey") % 50 < 8)
          .select(col("c_custkey").as("id_a"),
            (col("c_custkey") + 1).as("id_b"))
        val existing = DedupOps.clusterDuplicates(star)
        DedupOps.mergeClusters(existing, chain)
          .select(col("id"), col("cluster_id"))
      },
      Some("""WITH RECURSIVE pairs AS (
          SELECT c_custkey AS id_a, c_custkey - c_custkey % 5 AS id_b
          FROM customer WHERE c_custkey % 5 <> 0
          UNION ALL
          SELECT c_custkey, c_custkey + 1 FROM customer WHERE c_custkey % 50 < 8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id)
        SELECT CAST(id AS BIGINT) AS id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // Diversity-capped global selection: the 20 longest docs overall but
    // at most 3 per source — per-group WindowGroupLimit cut, then a
    // TakeOrdered over the bounded survivors.
    Query("q162_capped_topk",
      (s, dir) => graft.operators.SamplingOps.cappedTopK(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "n_chars", "source", "doc_id", k = 20, perGroupCap = 3),
      Some("""WITH capped AS (
          SELECT doc_id, source, n_chars FROM documents
          QUALIFY row_number() OVER (
            PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 3)
        SELECT doc_id, source, n_chars FROM capped
        ORDER BY n_chars DESC, doc_id LIMIT 20""")),

    // Deterministic fixed-size per-group sample: exactly 50 docs per
    // source chosen by md5(doc_id) rank — stable across runs/partitioning
    // and byte-replayable by the oracle (md5 is standardized); the rank
    // cut plans as WindowGroupLimit below the shuffle.
    Query("q166_hash_sample_n",
      (s, dir) => graft.operators.SamplingOps.hashSampleN(
        t(s, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", n = 50),
      Some("""SELECT doc_id, source FROM (
          SELECT doc_id, source, row_number() OVER (
            PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
          FROM documents) WHERE r <= 50""")),

    // Padding-waste audit for length-bucketed batching: per capacity
    // bucket (smallest of 500/1000/2000/4000 that fits; overflow
    // truncates into the largest), exact integer padded/truncated units
    // and the permille waste — one CASE + one map-side-combined agg.
    Query("q167_padding_waste",
      (s, dir) => graft.operators.TokenizerOps.paddingWasteReport(
        t(s, dir, "documents"), "n_chars", Seq(500L, 1000L, 2000L, 4000L)),
      Some("""WITH b AS (
          SELECT CAST(CASE WHEN n_chars <= 500 THEN 500
              WHEN n_chars <= 1000 THEN 1000
              WHEN n_chars <= 2000 THEN 2000 ELSE 4000 END AS BIGINT)
            AS capacity,
            CAST(n_chars AS BIGINT) AS len
          FROM documents)
        SELECT capacity, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(len) AS BIGINT) AS sum_len,
          CAST(sum(greatest(capacity - len, 0)) AS BIGINT) AS padded_units,
          CAST(sum(greatest(len - capacity, 0)) AS BIGINT)
            AS truncated_units,
          CAST((sum(greatest(capacity - len, 0))
              + sum(greatest(len - capacity, 0))) * 1000
            // (capacity * count(*)) AS BIGINT) AS waste_permille
        FROM b GROUP BY 1""")),

    // Neyman (optimal) stratified-sampling allocation: budget split
    // proportionally to N_h*sigma_h = sqrt(N*sum(x^2) - sum(x)^2) — the
    // moments exact in 128-bit, the one sqrt IEEE-identical, the
    // apportionment pure integer largest-remainder.
    Query("q168_neyman_allocation",
      (s, dir) => graft.operators.SamplingOps.neymanAllocation(
        t(s, dir, "documents"), "source", "n_chars", budget = 200L),
      Some("""WITH s AS (
          SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(n_chars) AS HUGEINT) AS s1,
            CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
          FROM documents GROUP BY 1),
        w0 AS (SELECT stratum, n_rows,
            CAST(floor(sqrt(CAST(n_rows * s2 - s1 * s1 AS DOUBLE)) * 1e6
              + 0.5) AS HUGEINT) AS wq
          FROM s),
        tot AS (SELECT sum(wq) AS tw, CAST(sum(n_rows) AS HUGEINT) AS tn
          FROM w0),
        w AS (SELECT stratum, n_rows,
            CASE WHEN tw > 0 THEN wq ELSE CAST(n_rows AS HUGEINT) END AS wq,
            CASE WHEN tw > 0 THEN tw ELSE tn END AS bigw
          FROM w0 CROSS JOIN tot),
        q AS (SELECT stratum, n_rows, wq,
            (200 * wq) // bigw AS base, (200 * wq) % bigw AS rem
          FROM w),
        lo AS (SELECT 200 - sum(base) AS leftover FROM q),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, stratum)
            AS rk FROM q)
        SELECT stratum, n_rows, CAST(wq AS BIGINT) AS weight_q,
          CAST(least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END,
            CAST(n_rows AS HUGEINT)) AS BIGINT) AS alloc
        FROM r CROSS JOIN lo""")),

    // Exact cross-source duplication matrix at word-3-gram granularity:
    // the true pairwise shared-shingle counts + Jaccard permille the q94
    // bottom-k sketch only estimates — run on the candidate pairs the
    // sketch flags. Zero-overlap pairs appear too (grid completed from
    // the bounded per-source totals).
    Query("q169_source_overlap_exact",
      (s, dir) => graft.operators.CorpusCompareOps.sourceOverlapExact(
        // single-file testdata reads as ONE scan task; spread the docs
        // before the shingle explode so the (embarrassingly parallel)
        // map side uses the session's cores — the round-12 probe-layout
        // finding, applied to the catalog binding
        t(s, dir, "documents").repartition(
            s.sparkContext.defaultParallelism)
          .select(col("source"),
            explode(graft.operators.DedupOps.shinglesCol(col("text"), 3))
              .as("sg")),
        "sg", "source"),
      Some(s"""WITH toks AS (
          SELECT source, list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
          FROM documents),
        sh AS (SELECT source, unnest(list_distinct(
            CASE WHEN len(t)=0 THEN []
              WHEN len(t)<3 THEN [array_to_string(t,' ')]
              ELSE [t[i]||' '||t[i+1]||' '||t[i+2]
                    for i in generate_series(1, len(t)-2)] END)) AS sg
          FROM toks),
        -- shingles are already whitespace-normalized lowercase, so the
        -- operator's trim/collapse/lower is an identity here and the fnv
        -- replay hashes sg directly
        p AS MATERIALIZED (SELECT DISTINCT source,
            ${HashOracleSql.fnv1a64("sg")} AS fp
          FROM sh),
        t AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY 1),
        shd AS (SELECT a.source AS src_a, b.source AS src_b,
            CAST(count(*) AS BIGINT) AS n_shared
          FROM p a JOIN p b ON a.fp = b.fp AND a.source < b.source
          GROUP BY 1, 2)
        SELECT ta.source AS src_a, tb.source AS src_b,
          ta.n AS n_a, tb.n AS n_b,
          coalesce(shd.n_shared, 0) AS n_shared,
          CAST(coalesce(shd.n_shared, 0) * 1000
            // (ta.n + tb.n - coalesce(shd.n_shared, 0)) AS BIGINT)
            AS jaccard_permille
        FROM t ta JOIN t tb ON ta.source < tb.source
        LEFT JOIN shd ON shd.src_a = ta.source
          AND shd.src_b = tb.source""")),

    // Out-of-vocabulary rate per source against a SIZE-LIMITED tokenizer
    // vocabulary (the global top-20 tokens) — occurrence-weighted, so the
    // permille is the fraction of token MASS a 20-entry vocab cannot
    // cover in each source.
    Query("q170_oov_rate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.TokenizerOps.oovRate(docs, "text", "source",
          graft.operators.TextOps.tokenFrequencies(docs, "text", k = 20)
            .select(col("token")),
          "token")
      },
      Some("""WITH tk AS (
          SELECT source, unnest(list_filter(
            regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
            AS term
          FROM documents),
        v AS (SELECT term FROM (
            SELECT term, count(*) AS c FROM tk GROUP BY 1
            ORDER BY c DESC, term LIMIT 20)),
        r AS (SELECT tk.source, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS oov_tokens
          FROM tk LEFT JOIN v ON tk.term = v.term GROUP BY 1)
        SELECT source, n_tokens, oov_tokens,
          CAST(oov_tokens * 1000 // n_tokens AS BIGINT) AS oov_permille
        FROM r""")),

    // Filter-impact waterfall over an ordered quality pipeline:
    // per-rule isolation failures, pipeline-order first-fail attribution
    // (each rule's marginal head-count), and the surviving count after
    // each stage — 3 x |rules| conditional sums in ONE scan.
    Query("q171_filter_waterfall",
      (s, dir) => graft.operators.ProfileOps.filterWaterfall(
        t(s, dir, "documents"), Seq(
          "min_len" -> (col("n_chars") >= 100),
          "max_len" -> (col("n_chars") <= 400),
          "english" -> (col("lang") === "en"))),
      Some("""WITH f AS (SELECT
            coalesce(n_chars >= 100, false) AS p1,
            coalesce(n_chars <= 400, false) AS p2,
            coalesce(lang = 'en', false) AS p3
          FROM documents)
        SELECT CAST(1 AS INT) AS rule_order, 'min_len' AS rule,
          CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_fail,
          CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_first_fail,
          CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_surviving
        FROM f
        UNION ALL
        SELECT CAST(2 AS INT), 'max_len',
          CAST(sum(CASE WHEN NOT p2 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN p1 AND NOT p2 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT)
        FROM f
        UNION ALL
        SELECT CAST(3 AS INT), 'english',
          CAST(sum(CASE WHEN NOT p3 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(sum(CASE WHEN p1 AND p2 AND NOT p3 THEN 1 ELSE 0 END)
            AS BIGINT),
          CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END)
            AS BIGINT)
        FROM f""")),

    // Nearest-centroid label confusion: one centroid per label (the
    // kmeans update step with labels as fixed assignments, exact
    // floorDiv per dimension), every vector classified by exact
    // quantized L2, ties to the smallest label — the "are these labels
    // separable in embedding space" audit.
    Query("q174_nearest_centroid_eval",
      (s, dir) => graft.operators.ClusteringOps.nearestCentroidEval(
        t(s, dir, "embeddings"), "label"),
      Some("""WITH q AS MATERIALIZED (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
            list_transform(CAST(embedding AS DOUBLE[]),
              x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qv
          FROM embeddings),
        cells AS (
          SELECT label, t.d,
            CAST(floor(CAST(sum(qv[t.d + 1]) AS DOUBLE) / count(*))
              AS BIGINT) AS v
          FROM q CROSS JOIN range(64) t(d) GROUP BY label, t.d),
        c AS (SELECT label AS clabel,
            list_transform(list(v ORDER BY d), x -> CAST(x AS DOUBLE))
              AS cvd
          FROM cells GROUP BY label),
        qx AS (SELECT vec_id, label,
            list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd FROM q),
        s AS (SELECT t.vec_id, t.label, c.clabel,
            list_inner_product(t.qvd, t.qvd)
              - 2 * list_inner_product(t.qvd, c.cvd)
              + list_inner_product(c.cvd, c.cvd) AS dist
          FROM qx t CROSS JOIN c),
        a AS (SELECT vec_id, label, clabel AS predicted FROM (
            SELECT vec_id, label, clabel, row_number() OVER (
              PARTITION BY vec_id ORDER BY dist ASC, clabel ASC) AS rn
            FROM s) WHERE rn = 1)
        SELECT label, predicted, CAST(count(*) AS BIGINT) AS n
        FROM a GROUP BY 1, 2""")),

    // Burst-activity (bot-likelihood) report: per user, total events and
    // the max events inside any single hour bucket; flag at >= 3 — two
    // stacked keyed aggregations, no window.
    Query("q175_burst_activity",
      (s, dir) => graft.operators.Sessionize.burstActivityReport(
        t(s, dir, "events"), "user_id", "ts",
        bucketMs = 3600000L, burstThreshold = 3L),
      Some("""WITH b AS (
          SELECT user_id AS key, epoch_ms(ts) // 3600000 AS hb,
            CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2)
        SELECT key, CAST(sum(c) AS BIGINT) AS n_events,
          CAST(max(c) AS BIGINT) AS max_per_bucket,
          max(c) >= 3 AS is_burst
        FROM b GROUP BY 1""")),

    // Snapshot profile drift: documents vs a degraded next snapshot
    // (every 7th lang nulled, source column dropped) — per column the
    // exact null-rate permille delta, cardinality delta, and
    // added/removed status.
    Query("q176_profile_drift",
      (s, dir) => {
        val a = t(s, dir, "documents")
        val b = a
          .withColumn("lang",
            when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")))
          .drop("source")
        graft.operators.ProfileOps.profileDrift(
          a, Seq("text", "lang", "source"), b, Seq("text", "lang"))
      },
      Some("""WITH b AS (
          SELECT doc_id, text,
            CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang
          FROM documents),
        pa AS (
          SELECT 'text' AS col_name, CAST(count(*) AS BIGINT) AS n_rows_a,
            CAST(count(*) - count(text) AS BIGINT) AS n_nulls_a,
            CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_a
          FROM documents
          UNION ALL
          SELECT 'lang', count(*), count(*) - count(lang),
            count(DISTINCT lang) FROM documents
          UNION ALL
          SELECT 'source', count(*), count(*) - count(source),
            count(DISTINCT source) FROM documents),
        pb AS (
          SELECT 'text' AS col_name, CAST(count(*) AS BIGINT) AS n_rows_b,
            CAST(count(*) - count(text) AS BIGINT) AS n_nulls_b,
            CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_b
          FROM b
          UNION ALL
          SELECT 'lang', count(*), count(*) - count(lang),
            count(DISTINCT lang) FROM b)
        SELECT col_name,
          CASE WHEN n_rows_a IS NULL THEN 'added'
            WHEN n_rows_b IS NULL THEN 'removed'
            ELSE 'common' END AS status,
          n_rows_a, n_nulls_a, n_distinct_a,
          n_rows_b, n_nulls_b, n_distinct_b,
          (n_nulls_b * 1000 // n_rows_b) - (n_nulls_a * 1000 // n_rows_a)
            AS null_delta_permille,
          n_distinct_b - n_distinct_a AS distinct_delta
        FROM pa FULL OUTER JOIN pb USING (col_name)""")),

    // Functional-dependency violation audit: parts supplied by more than
    // one supplier under the (false) assumption l_partkey -> l_suppkey —
    // one exact count-distinct agg keyed by the determinant, TakeOrdered
    // head, deterministic (violations desc, det) order.
    Query("q177_fd_violations",
      (s, dir) => graft.operators.ProfileOps.fdViolations(
        t(s, dir, "lineitem"), "l_partkey", "l_suppkey", k = 25),
      Some("""SELECT l_partkey AS det, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_dep
        FROM lineitem GROUP BY 1
        HAVING count(DISTINCT l_suppkey) > 1
        ORDER BY n_distinct_dep DESC, det LIMIT 25""")),

    // Top event-type trigram paths: one keyed window (two leads share
    // the spec), map-side-combined path counts, TakeOrdered head.
    Query("q178_event_path_trigrams",
      (s, dir) => graft.operators.Sessionize.eventPathTrigrams(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
        k = 20),
      Some("""WITH e AS (
          SELECT event_type AS t1,
            lead(event_type, 1) OVER w AS t2,
            lead(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
        FROM e WHERE t3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n_paths DESC, t1, t2, t3 LIMIT 20""")),

    // Per-label embedding-centroid drift vs the global centroid:
    // quantized integer centroids (kmeans floorDiv rule), cosine as one
    // double chain over exactly-converted integer sums.
    Query("q179_centroid_drift",
      (s, dir) => graft.operators.ClusteringOps.sourceCentroidDrift(
        t(s, dir, "embeddings"), "label"),
      Some("""WITH q AS MATERIALIZED (
          SELECT label,
            list_transform(CAST(embedding AS DOUBLE[]),
              x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qv
          FROM embeddings),
        cells AS (
          SELECT label AS g, t.d, CAST(sum(qv[t.d + 1]) AS HUGEINT) AS s,
            CAST(count(*) AS BIGINT) AS n
          FROM q CROSS JOIN range(64) t(d) GROUP BY 1, 2),
        cents AS (SELECT g, d, n,
            CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c FROM cells),
        gcen AS (SELECT d,
            CAST(floor(CAST(sum(s) AS DOUBLE) / sum(n)) AS BIGINT) AS gc
          FROM cells GROUP BY 1),
        agg AS (SELECT g, max(n) AS n_vecs,
            CAST(sum(CAST(c AS HUGEINT) * gc) AS DOUBLE) AS dot,
            CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS na,
            CAST(sum(CAST(gc AS HUGEINT) * gc) AS DOUBLE) AS nb
          FROM cents JOIN gcen USING (d) GROUP BY g)
        SELECT g AS label, CAST(n_vecs AS BIGINT) AS n_vecs,
          CASE WHEN na = 0 OR nb = 0 THEN 0.0
            ELSE dot / (sqrt(na) * sqrt(nb)) END AS cosine_to_global
        FROM agg""")),

    // Corpus growth curve over a synthetic 30-day crawl timeline: new vs
    // re-seen exact-dedup fingerprints per day, cumulative distinct.
    Query("q180_corpus_growth",
      (s, dir) => graft.operators.SnapshotOps.corpusGrowthCurve(
        t(s, dir, "documents")
          .withColumn("day", pmod(col("doc_id") * 48271L, lit(30L))),
        "text", "day"),
      Some("""WITH s AS (
          SELECT ((doc_id * 48271) % 30 + 30) % 30 AS day,
            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        pd AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sightings
          FROM s GROUP BY 1),
        dd AS (SELECT day, CAST(count(*) AS BIGINT) AS n_distinct
          FROM (SELECT DISTINCT day, fp FROM s) GROUP BY 1),
        fs AS (SELECT fp, min(day) AS day FROM s GROUP BY 1),
        nw AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new
          FROM fs GROUP BY 1)
        SELECT pd.day, n_sightings, n_distinct,
          CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
          CAST(sum(coalesce(n_new, 0)) OVER (
            ORDER BY pd.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS cum_distinct
        FROM pd JOIN dd USING (day) LEFT JOIN nw USING (day)""")),

    // Domain-level link graph from synthesized crawl HTML: absolute
    // http(s) hrefs only (the third link is relative or carries
    // userinfo/port/fragment to exercise host extraction), rolled up to
    // (src_domain, dst_domain) edges.
    Query("q181_link_domain_edges",
      (s, dir) => graft.operators.WebOps.linkDomainEdges(
        t(s, dir, "documents").select(
          concat(lit("src"), pmod(col("doc_id"), lit(5L)).cast("string"))
            .as("dom"),
          col("doc_id"),
          concat(
            lit("<a href=\"https://site"),
            pmod(col("doc_id"), lit(7L)).cast("string"),
            lit(".example.com/p"), col("doc_id").cast("string"),
            lit("\">x</a>"),
            when(pmod(col("doc_id"), lit(3L)) === 0,
              concat(lit("<a href='http://user@Hub"),
                pmod(col("doc_id"), lit(2L)).cast("string"),
                lit(".example.com:8080/y#frag'>h</a>")))
              .otherwise(lit("<a href=\"/rel\">r</a>"))).as("html")),
        "dom", "html", "doc_id"),
      Some("""WITH h AS (
          SELECT 'src' || (doc_id % 5) AS src_domain, doc_id,
            '<a href="https://site' || (doc_id % 7) || '.example.com/p'
              || doc_id || '">x</a>' ||
            CASE WHEN doc_id % 3 = 0
              THEN '<a href=''http://user@Hub' || (doc_id % 2)
                || '.example.com:8080/y#frag''>h</a>'
              ELSE '<a href="/rel">r</a>' END AS html
          FROM documents),
        u AS (SELECT src_domain, doc_id,
            unnest(regexp_extract_all(html,
              '(?i)href\s*=\s*["'']([^"''#>]+)', 1)) AS url
          FROM h),
        d AS (SELECT src_domain, doc_id,
            lower(regexp_extract(url,
              '^(?i)https?://(?:[^/@?#]*@)?([^:/?#]+).*', 1)) AS dst
          FROM u),
        e AS (SELECT src_domain, dst AS dst_domain, doc_id,
            CAST(count(*) AS BIGINT) AS n
          FROM d WHERE dst IS NOT NULL AND dst <> '' GROUP BY 1, 2, 3)
        SELECT src_domain, dst_domain, CAST(sum(n) AS BIGINT) AS n_links,
          CAST(count(*) AS BIGINT) AS n_docs
        FROM e GROUP BY 1, 2""")),

    // The k most-linked destination domains of the q181 graph —
    // TakeOrdered over the bounded edge table.
    Query("q182_top_linked_domains",
      (s, dir) => graft.operators.WebOps.topLinkedDomains(
        graft.operators.WebOps.linkDomainEdges(
          t(s, dir, "documents").select(
            concat(lit("src"), pmod(col("doc_id"), lit(5L)).cast("string"))
              .as("dom"),
            col("doc_id"),
            concat(
              lit("<a href=\"https://site"),
              pmod(col("doc_id"), lit(7L)).cast("string"),
              lit(".example.com/p"), col("doc_id").cast("string"),
              lit("\">x</a>"),
              when(pmod(col("doc_id"), lit(3L)) === 0,
                concat(lit("<a href='http://user@Hub"),
                  pmod(col("doc_id"), lit(2L)).cast("string"),
                  lit(".example.com:8080/y#frag'>h</a>")))
                .otherwise(lit("<a href=\"/rel\">r</a>"))).as("html")),
          "dom", "html", "doc_id"),
        k = 6),
      Some("""WITH h AS (
          SELECT 'src' || (doc_id % 5) AS src_domain, doc_id,
            '<a href="https://site' || (doc_id % 7) || '.example.com/p'
              || doc_id || '">x</a>' ||
            CASE WHEN doc_id % 3 = 0
              THEN '<a href=''http://user@Hub' || (doc_id % 2)
                || '.example.com:8080/y#frag''>h</a>'
              ELSE '<a href="/rel">r</a>' END AS html
          FROM documents),
        u AS (SELECT src_domain, doc_id,
            unnest(regexp_extract_all(html,
              '(?i)href\s*=\s*["'']([^"''#>]+)', 1)) AS url
          FROM h),
        d AS (SELECT src_domain, doc_id,
            lower(regexp_extract(url,
              '^(?i)https?://(?:[^/@?#]*@)?([^:/?#]+).*', 1)) AS dst
          FROM u),
        e AS (SELECT src_domain, dst AS dst_domain, doc_id,
            CAST(count(*) AS BIGINT) AS n
          FROM d WHERE dst IS NOT NULL AND dst <> '' GROUP BY 1, 2, 3),
        g AS (SELECT src_domain, dst_domain,
            CAST(sum(n) AS BIGINT) AS n_links,
            CAST(count(*) AS BIGINT) AS n_docs
          FROM e GROUP BY 1, 2)
        SELECT dst_domain, CAST(sum(n_links) AS BIGINT) AS n_links,
          CAST(sum(n_docs) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_src_domains
        FROM g GROUP BY 1
        ORDER BY n_links DESC, dst_domain LIMIT 6""")),

    // Rendezvous-shard resize audit on the customer key space (8 -> 10
    // shards): only keys whose new shards win move (~(m-n)/m), unlike a
    // pmod reshuffle. Hash = splitmix64(fnv1a64(key) + s*GOLDEN) — the
    // minhash permutation family; the SQL twin writes (s+1) because
    // DedupOps.splitmix64 folds one GOLDEN in itself.
    Query("q183_rendezvous_resize",
      (s, dir) => graft.operators.ShardOps.rendezvousMoveReport(
        t(s, dir, "customer"), "c_custkey", 8, 10),
      Some(s"""WITH k AS (SELECT DISTINCT c_custkey FROM customer),
          |hb AS (SELECT c_custkey,
          |    ${HashOracleSql.fnv1a64("CAST(c_custkey AS VARCHAR)")} AS fh
          |  FROM k),
          |x0 AS (SELECT c_custkey, n.n AS n, t.s AS s,
          |    ((fh::HUGEINT + ((t.s::HUGEINT + 1) * ${HashOracleSql.goldenU}::HUGEINT)
          |       % 18446744073709551616::HUGEINT)
          |     % 18446744073709551616::HUGEINT)::UBIGINT AS x
          |  FROM hb CROSS JOIN (VALUES (8), (10)) n(n)
          |  CROSS JOIN range(10) t(s) WHERE t.s < n.n),
          |${HashOracleSql.splitmixCtes("x0", "c_custkey, n, s", "sm")},
          |w AS (SELECT c_custkey, n, s, row_number() OVER (
          |    PARTITION BY c_custkey, n ORDER BY h DESC, s DESC) AS rn
          |  FROM sm),
          |p AS (SELECT c_custkey,
          |    max(CASE WHEN n = 8 THEN s END) AS f,
          |    max(CASE WHEN n = 10 THEN s END) AS t
          |  FROM w WHERE rn = 1 GROUP BY 1)
          |SELECT CAST(count(*) AS BIGINT) AS n_keys,
          |  CAST(sum(CASE WHEN f <> t THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_moved,
          |  CAST(sum(CASE WHEN f <> t THEN 1 ELSE 0 END) * 1000
          |    // count(*) AS BIGINT) AS moved_permille
          |FROM p""".stripMargin)),

    // Two-sample KS drift: do purchase events draw their value from the
    // same distribution as everything else? Floor-unit buckets bound the
    // CDF grid; exact integer cross-products, one double division.
    Query("q184_ks_value_drift",
      (s, dir) => graft.operators.Stats.ksDrift(
        t(s, dir, "events").select(
          (col("event_type") === "purchase").as("side"),
          floor(col("value")).cast("long").as("vb")),
        "side", "vb"),
      Some("""WITH g AS (
          SELECT CAST(floor(value) AS BIGINT) AS v,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
              AS HUGEINT) AS nr,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS HUGEINT) AS nc
          FROM events
          WHERE value IS NOT NULL AND event_type IS NOT NULL
          GROUP BY 1),
        c AS (SELECT v,
            sum(nr) OVER (ORDER BY v) AS cr,
            sum(nc) OVER (ORDER BY v) AS cc,
            sum(nr) OVER () AS tr, sum(nc) OVER () AS tc
          FROM g),
        d AS (SELECT v, abs(cr * tc - cc * tr) AS dn, tr, tc FROM c),
        m AS (SELECT max(dn) AS dmax FROM d)
        SELECT CAST(max(tr) AS BIGINT) AS n_ref,
          CAST(max(tc) AS BIGINT) AS n_cur,
          CAST(min(CASE WHEN dn = dmax THEN v END) AS BIGINT) AS ks_at,
          CASE WHEN max(tr) = 0 OR max(tc) = 0 THEN NULL
            ELSE CAST(max(dn) AS DOUBLE)
              / (CAST(max(tr) AS DOUBLE) * CAST(max(tc) AS DOUBLE)) END
            AS ks_d
        FROM d CROSS JOIN m""")),

    // Mutual information between language and source: does knowing the
    // source predict the language? Quantized-ln chain over exact joint /
    // marginal counts (the PSI/BM25 recipe).
    Query("q185_mutual_information",
      (s, dir) => graft.operators.Stats.mutualInformationReport(
        t(s, dir, "documents"), "lang", "source"),
      Some("""WITH cells AS (
          SELECT lang AS a, source AS b, CAST(count(*) AS HUGEINT) AS c
          FROM documents GROUP BY 1, 2),
        ra AS (SELECT a, sum(c) AS ra FROM cells GROUP BY 1),
        cb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY 1),
        tot AS (SELECT sum(c) AS n, CAST(count(*) AS BIGINT) AS ncells
          FROM cells),
        mi AS (SELECT sum(CAST(floor(CAST(c AS DOUBLE)
              * ln(CAST(c * n AS DOUBLE) / CAST(ra * cb AS DOUBLE))
              * 1e7 + 0.5) AS HUGEINT)) AS miq
          FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot),
        ha AS (SELECT sum(CAST(floor(CAST(ra AS DOUBLE)
              * -ln(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
              * 1e7 + 0.5) AS HUGEINT)) AS haq FROM ra CROSS JOIN tot),
        hb AS (SELECT sum(CAST(floor(CAST(cb AS DOUBLE)
              * -ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
              * 1e7 + 0.5) AS HUGEINT)) AS hbq FROM cb CROSS JOIN tot)
        SELECT CAST(n AS BIGINT) AS n, ncells AS n_cells,
          CAST(miq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e7) AS mi_nats,
          CAST(haq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e7) AS h_a,
          CAST(hbq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e7) AS h_b,
          CASE WHEN haq <= 0 OR hbq <= 0 THEN NULL
            ELSE CAST(miq AS DOUBLE)
              / sqrt(CAST(haq AS DOUBLE) * CAST(hbq AS DOUBLE)) END
            AS nmi
        FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN tot""")),

    // Cohen's kappa between the recorded language and the n-gram
    // language-id prediction — chance-corrected labeler agreement, all
    // terms exact integers, one double division.
    Query("q186_label_agreement",
      (s, dir) => graft.operators.Stats.cohenKappa(
        t(s, dir, "documents").select(col("lang"),
          graft.operators.TextOps.langId(col("text")).as("pred_lang")),
        "lang", "pred_lang"),
      Some(s"""WITH p AS (
          |  SELECT lang AS a, $langIdSql AS b FROM documents),
          |agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
          |    CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0
          |      END) AS HUGEINT) AS agree
          |  FROM p),
          |ra AS (SELECT a, CAST(count(*) AS HUGEINT) AS ra
          |  FROM p GROUP BY 1),
          |cb AS (SELECT b, CAST(count(*) AS HUGEINT) AS cb
          |  FROM p GROUP BY 1),
          |pe AS (SELECT COALESCE(sum(ra * cb), 0) AS pe
          |  FROM ra JOIN cb ON ra.a IS NOT DISTINCT FROM cb.b)
          |SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
          |  CASE WHEN n * n = pe THEN NULL
          |    ELSE CAST(agree * n - pe AS DOUBLE)
          |      / CAST(n * n - pe AS DOUBLE) END AS kappa
          |FROM agg CROSS JOIN pe""".stripMargin)),

    // Benford first-digit audit of extended prices per return flag —
    // string-derived leading digit (never log10), chi2 as a fixed 9-term
    // quantized chain with the log10(1+1/d) literals embedded from the
    // JVM on both sides.
    Query("q187_benford",
      (s, dir) => graft.operators.Stats.benfordAudit(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("cents")),
        "l_returnflag", "cents"),
      Some(benfordSql)),

    // Simplified silhouette per embedding label — centroid-based
    // cluster-coherence score, quantized at 1e7 and summed exactly.
    Query("q188_silhouette",
      (s, dir) => graft.operators.ClusteringOps.simplifiedSilhouette(
        t(s, dir, "embeddings"), "label"),
      Some("""WITH q AS MATERIALIZED (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
            list_transform(CAST(embedding AS DOUBLE[]),
              x -> CAST(floor(x * 1048576 + 0.5) AS BIGINT)) AS qv
          FROM embeddings),
        cells AS (
          SELECT label, t.d,
            CAST(floor(CAST(sum(qv[t.d + 1]) AS DOUBLE) / count(*))
              AS BIGINT) AS v
          FROM q CROSS JOIN range(64) t(d) GROUP BY label, t.d),
        c AS (SELECT label AS clabel,
            list_transform(list(v ORDER BY d), x -> CAST(x AS DOUBLE))
              AS cvd
          FROM cells GROUP BY label),
        qx AS (SELECT vec_id, label,
            list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd FROM q),
        s AS (SELECT t.vec_id, t.label, c.clabel,
            list_inner_product(t.qvd, t.qvd)
              - 2 * list_inner_product(t.qvd, c.cvd)
              + list_inner_product(c.cvd, c.cvd) AS dist
          FROM qx t CROSS JOIN c),
        ab AS (SELECT vec_id, label,
            max(CASE WHEN clabel = label THEN dist END) AS a,
            min(CASE WHEN clabel <> label THEN dist END) AS b
          FROM s GROUP BY 1, 2),
        sq AS (SELECT label,
            CAST(floor((CASE WHEN a = 0 AND b = 0 THEN 0.0
              ELSE (sqrt(b) - sqrt(a)) / greatest(sqrt(a), sqrt(b)) END)
              * 1e7 + 0.5) AS HUGEINT) AS sq
          FROM ab)
        SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
          CAST(sum(sq) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e7)
            AS mean_silhouette
        FROM sq GROUP BY 1""")),

    // CUSUM changepoint over daily per-type volumes: where did each
    // event type's mean rate permanently shift? Exact integer
    // S_i = m*cum_i - i*T over the bounded per-key day timeline.
    Query("q189_cusum_volume_shift",
      (s, dir) => graft.operators.Sessionize.cusumChangepoint(
        t(s, dir, "events"), "event_type", "ts", 86400000L),
      Some("""WITH b AS (
          SELECT event_type AS key, epoch_ms(ts) // 86400000 AS bucket,
            CAST(count(*) AS HUGEINT) AS n
          FROM events GROUP BY 1, 2),
        w AS (SELECT key, bucket,
            sum(n) OVER (PARTITION BY key ORDER BY bucket) AS cum,
            CAST(row_number() OVER (PARTITION BY key ORDER BY bucket)
              AS HUGEINT) AS i,
            sum(n) OVER (PARTITION BY key) AS t,
            CAST(count(*) OVER (PARTITION BY key) AS HUGEINT) AS m
          FROM b),
        s AS (SELECT key, bucket, i, m, t,
            abs(m * cum - i * t) AS sdev FROM w),
        mx AS (SELECT key, max(m) AS m, max(t) AS t,
            max(CASE WHEN i < m THEN sdev END) AS peak
          FROM s GROUP BY 1),
        cp AS (SELECT s.key,
            min(CASE WHEN s.i < s.m AND s.sdev = mx.peak THEN s.bucket
              END) AS cpb
          FROM s JOIN mx ON s.key = mx.key GROUP BY 1)
        SELECT mx.key, CAST(m AS BIGINT) AS n_buckets,
          CAST(t AS BIGINT) AS total,
          CASE WHEN peak IS NULL OR t = 0 THEN NULL
            ELSE CAST(cpb AS BIGINT) END AS cp_bucket,
          CASE WHEN peak IS NULL OR t = 0 THEN NULL
            ELSE CAST(peak AS BIGINT) END AS cusum_peak,
          CASE WHEN peak IS NULL OR t = 0 THEN NULL
            ELSE CAST(peak * 1000 // (m * t) AS BIGINT) END
            AS cusum_permille
        FROM mx JOIN cp ON mx.key = cp.key""")),

    // Per-source ROC AUC of document length against "is English" —
    // Mann-Whitney rank identity with exact midrank ties via the
    // two-phase distributed rank; one double division per group.
    Query("q190_quality_auc",
      (s, dir) => graft.operators.Stats.aucByGroup(
        t(s, dir, "documents").select(col("source"), col("n_chars"),
          (col("lang") === "en").as("is_en")),
        "source", "n_chars", "is_en"),
      Some("""WITH base AS (
          SELECT source AS g, n_chars AS s, (lang = 'en') AS y
          FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        r AS (SELECT g, s, y,
            rank() OVER (PARTITION BY g ORDER BY s) AS rmin,
            count(*) OVER (PARTITION BY g, s) AS c
          FROM base),
        agg AS (SELECT g,
            CAST(sum(CASE WHEN y THEN 2 * rmin + c - 1 ELSE 0 END)
              AS HUGEINT) AS spr2,
            CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS HUGEINT) AS np,
            CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS HUGEINT) AS nn
          FROM r GROUP BY 1)
        SELECT g AS source, CAST(np AS BIGINT) AS n_pos,
          CAST(nn AS BIGINT) AS n_neg,
          CASE WHEN np = 0 OR nn = 0 THEN NULL
            ELSE CAST(spr2 - np * (np + 1) AS DOUBLE)
              / CAST(2 * np * nn AS DOUBLE) END AS auc
        FROM agg""")),

    // Flesch reading-ease per document: codegen'd regexp counts, one
    // fixed double chain.
    Query("q191_readability",
      (s, dir) => graft.operators.TextOps.fleschReadability(
        t(s, dir, "documents")),
      Some("""WITH w AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(
              lower(coalesce(text, '')), '\s+'), x -> x <> '') AS words,
            len(regexp_extract_all(lower(coalesce(text, '')), '[.!?]+'))
              AS n_sentences
          FROM documents),
        c AS (SELECT doc_id,
            CAST(len(words) AS BIGINT) AS n_words,
            CAST(n_sentences AS BIGINT) AS n_sentences,
            CAST(coalesce(list_sum(list_transform(words,
              x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))),
              0) AS BIGINT) AS n_syllables
          FROM w)
        SELECT doc_id, n_words, n_sentences, n_syllables,
          CASE WHEN n_words = 0 THEN NULL
            ELSE 206.835
              - 1.015 * (CAST(n_words AS DOUBLE)
                  / CAST(greatest(1, n_sentences) AS DOUBLE))
              - 84.6 * (CAST(n_syllables AS DOUBLE)
                  / CAST(n_words AS DOUBLE)) END AS flesch
        FROM c""")),

    // Weekly (lag-7) autocorrelation of daily per-type volumes:
    // calendar-lag self-join of the bucket grid, exact DECIMAL moments,
    // one double chain.
    Query("q192_volume_autocorr",
      (s, dir) => graft.operators.TimeSeriesOps.autocorrByKey(
        t(s, dir, "events"), "event_type", "ts", 86400000L, lagK = 7),
      Some("""WITH b AS (
          SELECT event_type AS key, epoch_ms(ts) // 86400000 AS bucket,
            CAST(count(*) AS HUGEINT) AS n
          FROM events GROUP BY 1, 2),
        p AS (SELECT x.key, x.n AS xv, y.n AS yv
          FROM b x JOIN b y
            ON x.key = y.key AND x.bucket = y.bucket + 7),
        a AS (SELECT key, CAST(count(*) AS HUGEINT) AS n,
            sum(xv) AS sx, sum(yv) AS sy, sum(xv * yv) AS sxy,
            sum(xv * xv) AS sxx, sum(yv * yv) AS syy
          FROM p GROUP BY 1)
        SELECT key, CAST(n AS BIGINT) AS n_pairs,
          CASE WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy
            THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
              / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS acf
        FROM a""")),

    // Personalized PageRank on the co-purchase graph from the
    // "every 50th part" seed set — integer Pregel, oracle = unrolled
    // CTE recurrence (the q93 recipe with seed-conditional restart).
    Query("q193_seeded_pagerank",
      (s, dir) => {
        val edges = graft.operators.GraphOps.coOccurrenceEdges(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
        val seeds = edges.select(col("src").as("node"))
          .filter(pmod(col("node"), lit(50L)) === 0).distinct()
        graft.operators.GraphOps.personalizedPageRankTopK(
          edges, seeds, iters = 3, k = 50)
      },
      Some(s"""WITH pairs AS (
          |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
          |nodes AS (SELECT DISTINCT src AS node FROM pairs),
          |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
          |           FROM pairs GROUP BY src),
          |r0 AS (SELECT node,
          |  CAST(CASE WHEN node % 50 = 0 THEN 1000000000 ELSE 0 END
          |    AS BIGINT) AS rank FROM nodes),
          |${(1 to 3).map(pprIter).mkString(",\n")}
          |SELECT node, rank AS rank_q FROM r3
          |ORDER BY rank_q DESC, node LIMIT 50""".stripMargin)),

    // Lexical-richness profile per source: hapax share and type-token
    // ratio from the SHARED termCounts tokenization.
    Query("q194_lexical_richness",
      (s, dir) => graft.operators.TokenizerOps.hapaxStats(
        t(s, dir, "documents"), "text", "source"),
      Some("""WITH tk AS (
          SELECT source, unnest(list_filter(
            regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
            AS term
          FROM documents),
        g AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
          FROM tk GROUP BY 1, 2),
        a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS n_types,
            CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_hapax
          FROM g GROUP BY 1)
        SELECT source, n_tokens, n_types, n_hapax,
          CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
          CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)
            AS hapax_ratio
        FROM a""")),

    // Per-user event-type entropy: the behavioral-diversity bot signal
    // — quantized-ln chain over exact per-(user, type) counts.
    Query("q195_user_entropy",
      (s, dir) => graft.operators.Stats.entropyByGroup(
        t(s, dir, "events"), "user_id", "event_type"),
      Some("""WITH g AS (
          SELECT user_id, event_type AS v, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        n AS (SELECT user_id, v, c,
            sum(c) OVER (PARTITION BY user_id) AS n FROM g),
        q AS (SELECT user_id, n,
            CAST(floor(CAST(c AS DOUBLE)
              * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
              * 1e7 + 0.5) AS HUGEINT) AS hq
          FROM n)
        SELECT user_id, CAST(max(n) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS n_distinct,
          CAST(sum(hq) AS DOUBLE) / (CAST(max(n) AS DOUBLE) * 1e7)
            AS entropy_nats
        FROM q GROUP BY 1""")),

    // Ranked-retrieval eval: per source, rank docs by length and score
    // the ranking against "is English" relevance — P@10 / MRR / NDCG@10
    // with the quantized discount table embedded as literals on BOTH
    // sides (no log in either engine).
    Query("q196_ranked_eval",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))
        graft.operators.RankFusionOps.rankedEval(
          t(s, dir, "documents").select(col("source"),
            row_number().over(w).as("rnk"),
            (col("lang") === "en").as("rel")),
          "source", "rnk", "rel", k = 10)
      },
      Some(rankedEvalSql)),

    // Smoothed target encoding of suppliers by line price: shrunken
    // category means, every product exact in HUGEINT/DECIMAL, one
    // double division.
    Query("q197_target_encode",
      (s, dir) => graft.operators.Stats.targetEncode(
        t(s, dir, "lineitem").select(col("l_suppkey"),
          cents(col("l_extendedprice")).as("cents")),
        "l_suppkey", "cents", priorWeight = 20L),
      Some("""WITH c AS (
          SELECT l_suppkey AS cat, CAST(count(*) AS HUGEINT) AS n,
            CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS HUGEINT) AS s
          FROM lineitem GROUP BY 1),
        g AS (SELECT sum(n) AS gn, sum(s) AS gs FROM c)
        SELECT cat AS l_suppkey, CAST(n AS BIGINT) AS n,
          CAST(s AS BIGINT) AS sum_cents,
          CAST(s * gn + 20 * gs AS DOUBLE)
            / CAST((n + 20) * gn AS DOUBLE) AS encoded
        FROM c CROSS JOIN g""")),

    // JSON key discovery over a synthesized semi-structured props column
    // (numbers, strings, floats, arrays, JSON nulls, and malformed rows
    // — the third value class exercises every census branch): per key,
    // presence, cardinality, and a value-type census.
    Query("q198_json_key_profile",
      (s, dir) => graft.operators.ProfileOps.jsonKeyProfile(
        t(s, dir, "events").select(
          when(pmod(col("event_id"), lit(17L)) === 0, lit("{oops"))
            .otherwise(concat(
              lit("{\"k\": "),
              pmod(col("event_id"), lit(100L)).cast("string"),
              when(pmod(col("event_id"), lit(3L)) === 0,
                lit(", \"dev\": \"mobile\""))
                .when(pmod(col("event_id"), lit(3L)) === 1,
                  lit(", \"dev\": \"web\""))
                .otherwise(lit("")),
              when(pmod(col("event_id"), lit(7L)) === 0,
                lit(", \"score\": 1.5")).otherwise(lit("")),
              when(pmod(col("event_id"), lit(11L)) === 0,
                lit(", \"tags\": [1, 2]")).otherwise(lit("")),
              when(pmod(col("event_id"), lit(13L)) === 0,
                lit(", \"extra\": null")).otherwise(lit("")),
              lit("}"))).as("props")),
        "props"),
      Some("""WITH p AS (
          SELECT CASE WHEN event_id % 17 = 0 THEN '{oops' ELSE
            '{"k": ' || (event_id % 100) ||
            CASE WHEN event_id % 3 = 0 THEN ', "dev": "mobile"'
              WHEN event_id % 3 = 1 THEN ', "dev": "web"'
              ELSE '' END ||
            CASE WHEN event_id % 7 = 0 THEN ', "score": 1.5'
              ELSE '' END ||
            CASE WHEN event_id % 11 = 0 THEN ', "tags": [1, 2]'
              ELSE '' END ||
            CASE WHEN event_id % 13 = 0 THEN ', "extra": null'
              ELSE '' END || '}' END AS props
          FROM events),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CASE WHEN json_valid(props) THEN 0 ELSE 1 END)
              AS BIGINT) AS n_bad
          FROM p),
        kv0 AS (SELECT props, unnest(json_keys(props::JSON)) AS key
          FROM p WHERE json_valid(props)),
        kv AS (SELECT key,
            CASE WHEN json_type(json_extract(props::JSON, '$.' || key))
                = 'NULL' THEN NULL
              WHEN json_type(json_extract(props::JSON, '$.' || key))
                = 'VARCHAR'
                THEN json_extract_string(props::JSON, '$.' || key)
              ELSE CAST(json_extract(props::JSON, '$.' || key)
                AS VARCHAR) END AS v
          FROM kv0),
        a AS (SELECT key,
            CAST(count(*) AS BIGINT) AS n_present,
            CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
            CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_null,
            CAST(sum(CASE WHEN v IN ('true', 'false') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_bool,
            CAST(sum(CASE WHEN v IS NOT NULL AND regexp_matches(v,
              '^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$') THEN 1 ELSE 0
              END) AS BIGINT) AS n_num,
            CAST(sum(CASE WHEN v LIKE '{%' OR v LIKE '[%' THEN 1 ELSE 0
              END) AS BIGINT) AS n_nested,
            CAST(sum(CASE WHEN v IS NOT NULL
              AND v NOT IN ('true', 'false')
              AND NOT regexp_matches(v,
                '^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$')
              AND v NOT LIKE '{%' AND v NOT LIKE '[%' THEN 1 ELSE 0
              END) AS BIGINT) AS n_str
          FROM kv GROUP BY 1)
        SELECT key, n_present,
          CAST(n_present * 1000 // n_rows AS BIGINT) AS present_permille,
          n_distinct, n_null, n_bool, n_num, n_nested, n_str,
          n_rows, n_bad
        FROM a CROSS JOIN tot""")),

    // Distribution-shape census of line prices per return flag: mean /
    // variance / skewness / excess kurtosis from four exact HUGEINT
    // power sums and one fixed double chain.
    Query("q199_price_moments",
      (s, dir) => graft.operators.Stats.momentsByGroup(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("cents")),
        "l_returnflag", "cents"),
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x
          FROM lineitem),
        a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(x AS HUGEINT)) AS s1,
            sum(CAST(x AS HUGEINT) * x) AS s2,
            sum(CAST(x AS HUGEINT) * x * x) AS s3,
            sum(CAST(x AS HUGEINT) * x * x * x) AS s4
          FROM v GROUP BY 1),
        lmb AS (SELECT g, n,
            (CAST(ABS(s1) // 1125899906842624 // 1125899906842624
                AS DOUBLE) * 1.2676506002282294e30
              + CAST(ABS(s1) // 1125899906842624 % 1125899906842624
                AS DOUBLE) * 1.125899906842624e15
              + CAST(ABS(s1) % 1125899906842624 AS DOUBLE))
              * (CASE WHEN s1 < 0 THEN -1.0 ELSE 1.0 END) AS d1,
            (CAST(ABS(s2) // 1125899906842624 // 1125899906842624
                AS DOUBLE) * 1.2676506002282294e30
              + CAST(ABS(s2) // 1125899906842624 % 1125899906842624
                AS DOUBLE) * 1.125899906842624e15
              + CAST(ABS(s2) % 1125899906842624 AS DOUBLE))
              * (CASE WHEN s2 < 0 THEN -1.0 ELSE 1.0 END) AS d2,
            (CAST(ABS(s3) // 1125899906842624 // 1125899906842624
                AS DOUBLE) * 1.2676506002282294e30
              + CAST(ABS(s3) // 1125899906842624 % 1125899906842624
                AS DOUBLE) * 1.125899906842624e15
              + CAST(ABS(s3) % 1125899906842624 AS DOUBLE))
              * (CASE WHEN s3 < 0 THEN -1.0 ELSE 1.0 END) AS d3,
            (CAST(ABS(s4) // 1125899906842624 // 1125899906842624
                AS DOUBLE) * 1.2676506002282294e30
              + CAST(ABS(s4) // 1125899906842624 % 1125899906842624
                AS DOUBLE) * 1.125899906842624e15
              + CAST(ABS(s4) % 1125899906842624 AS DOUBLE))
              * (CASE WHEN s4 < 0 THEN -1.0 ELSE 1.0 END) AS d4
          FROM a),
        m AS (SELECT g, n,
            d1 / CAST(n AS DOUBLE) AS mu,
            d2 / CAST(n AS DOUBLE) AS r2,
            d3 / CAST(n AS DOUBLE) AS r3,
            d4 / CAST(n AS DOUBLE) AS r4
          FROM lmb),
        c AS (SELECT g, n, mu,
            r2 - mu * mu AS m2,
            r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
            r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
              - 3.0 * mu * mu * mu * mu AS m4
          FROM m)
        SELECT g AS l_returnflag, n, mu AS mean, m2 AS variance,
          CASE WHEN n < 2 OR m2 <= 0 THEN NULL
            ELSE m3 / sqrt(m2 * m2 * m2) END AS skewness,
          CASE WHEN n < 2 OR m2 <= 0 THEN NULL
            ELSE m4 / (m2 * m2) - 3.0 END AS kurtosis
        FROM c""")),

    // Robust (median/IQR) scaling of event values within each type:
    // exact disc percentile cuts broadcast back, one double division.
    Query("q200_robust_scale",
      (s, dir) => graft.operators.Stats.robustScale(
        t(s, dir, "events").select(col("event_type"), col("event_id"),
          cents(col("value")).as("cents")),
        "event_type", "cents", "event_id"),
      Some("""WITH v AS (SELECT event_type, event_id,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        r AS (SELECT event_type, event_id, cents,
            row_number() OVER (
              PARTITION BY event_type ORDER BY cents, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        c AS (SELECT event_type,
            min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
              THEN cents END) AS lo,
            min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
              THEN cents END) AS med,
            min(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
              THEN cents END) AS hi
          FROM r GROUP BY 1)
        SELECT v.event_type, v.event_id, v.cents, c.med,
          c.hi - c.lo AS iqr,
          CASE WHEN c.hi - c.lo = 0 THEN NULL
            ELSE CAST(v.cents - c.med AS DOUBLE)
              / CAST(c.hi - c.lo AS DOUBLE) END AS robust_scaled
        FROM v JOIN c USING (event_type)""")),

    // Skip-gram (center, context) co-occurrence counts at window 2 —
    // the word2vec pair table; context-position explode keeps the
    // fanout at exactly 2w per token (never L^2 per document).
    Query("q201_skipgram_pairs",
      (s, dir) => graft.operators.TextOps.skipGramPairs(
        t(s, dir, "documents"), "doc_id", "text",
        window = 2, minCount = 5L),
      Some("""WITH l AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> x <> '') AS ws
          FROM documents),
        t AS (SELECT doc_id, unnest(ws) AS w,
            unnest(range(1, len(ws) + 1)) AS p
          FROM l),
        d(o) AS (VALUES (-2), (-1), (1), (2)),
        c AS (SELECT t.doc_id, t.w AS center, t.p + d.o AS cp
          FROM t CROSS JOIN d),
        j AS (SELECT c.center, t2.w AS context
          FROM c JOIN t t2 ON t2.doc_id = c.doc_id AND t2.p = c.cp)
        SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
        FROM j GROUP BY 1, 2 HAVING count(*) >= 5""")),

    // Exact pre-join cardinality probe of the lineitem self-join on
    // l_partkey — the fanout-bomb diagnostic: count tables join, the
    // data rows never do.
    Query("q202_join_size_probe",
      (s, dir) => graft.operators.SkewOps.joinSizeProbe(
        t(s, dir, "lineitem"), "l_partkey",
        t(s, dir, "lineitem"), "l_partkey"),
      Some("""WITH ca AS (SELECT l_partkey AS k,
            CAST(count(*) AS HUGEINT) AS na
          FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
        sa AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
            CAST(sum(na) AS BIGINT) AS rows_s FROM ca),
        j AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_common,
            CAST(coalesce(sum(a.na * b.na), 0) AS BIGINT) AS join_rows,
            CAST(coalesce(max(a.na * b.na), 0) AS BIGINT)
              AS max_key_rows
          FROM ca a JOIN ca b USING (k))
        SELECT sa.n_keys AS n_keys_a, sa.n_keys AS n_keys_b,
          j.n_keys_common, sa.rows_s AS rows_a, sa.rows_s AS rows_b,
          j.join_rows, j.max_key_rows
        FROM j CROSS JOIN sa""")),

    // Per-transition latency percentiles over user timelines: ONE keyed
    // lag window yields (prev->cur, gap); exact disc percentiles per
    // transition via the q86 distributed rank.
    Query("q203_transition_latency",
      (s, dir) => graft.operators.Sessionize.transitionLatency(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
            event_id
          FROM events),
        g AS (SELECT lag(event_type, 1) OVER w AS prev,
            event_type AS cur, ms - lag(ms, 1) OVER w AS gap, event_id
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        t AS (SELECT prev || '->' || cur AS transition, gap, event_id
          FROM g WHERE gap IS NOT NULL),
        r AS (SELECT transition, gap,
            row_number() OVER (
              PARTITION BY transition ORDER BY gap, event_id) AS rn,
            count(*) OVER (PARTITION BY transition) AS n
          FROM t)
        SELECT transition, CAST(max(n) AS BIGINT) AS n,
          min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
            THEN gap END) AS p50,
          min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
            THEN gap END) AS p90,
          min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
            THEN gap END) AS p99
        FROM r GROUP BY transition""")),

    // Per-segment PII risk census over the q47 synthesized contact text
    // (every 4th customer is PII-free so the permille is non-trivial):
    // docs-with-PII share and per-class hit totals.
    Query("q204_pii_census",
      (s, dir) => {
        val phone = concat(
          lit("25-"), lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((col("c_custkey") % 997).cast("string"), 3, "0"),
          lit("-"), lpad((col("c_custkey") % 9973).cast("string"), 4, "0"))
        val text = when(col("c_custkey") % 4 === 0,
          concat(col("c_mktsegment"), lit(" clean note")))
          .otherwise(concat(col("c_mktsegment"), lit(" contact "),
            col("c_name"), lit("@example.com ip 10.0.0."),
            (col("c_custkey") % 256), lit(" phone "), phone))
        graft.operators.TextOps.piiCensus(
          t(s, dir, "customer")
            .select(col("c_mktsegment").as("seg"), text.as("raw")),
          "raw", "seg")
      },
      Some(piiCensusSql)),

    // Temporal split audit over a leaky synthesized train/val/test
    // assignment (60/20/20 time cut, but every 97th event is forced
    // into train regardless — planted leakage): per boundary, clean
    // flag, range overlap, leaked-row count.
    Query("q205_temporal_split_audit",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val b = ev.agg(min(unix_millis(col("ts"))).as("lo"),
          max(unix_millis(col("ts"))).as("hi"))
        val withSplit = ev.crossJoin(broadcast(b))
          .withColumn("__ms", unix_millis(col("ts")))
          .withColumn("split",
            when(pmod(col("event_id"), lit(97L)) === 0, lit("train"))
              .when(col("__ms") < expr("lo + (hi - lo) * 6 div 10"),
                lit("train"))
              .when(col("__ms") < expr("lo + (hi - lo) * 8 div 10"),
                lit("val"))
              .otherwise(lit("test")))
        graft.operators.SamplingOps.temporalSplitAudit(
          withSplit, "split", "ts", Seq("train", "val", "test"))
      },
      Some("""WITH e AS (SELECT event_id, epoch_ms(ts) AS ms FROM events),
        b AS (SELECT min(ms) AS lo, max(ms) AS hi FROM e),
        s AS (SELECT ms, CASE WHEN event_id % 97 = 0 THEN 'train'
            WHEN ms < lo + (hi - lo) * 6 // 10 THEN 'train'
            WHEN ms < lo + (hi - lo) * 8 // 10 THEN 'val'
            ELSE 'test' END AS sp
          FROM e CROSS JOIN b),
        g AS (SELECT sp, CAST(count(*) AS BIGINT) AS n, min(ms) AS mn,
            max(ms) AS mx
          FROM s GROUP BY 1),
        l AS (SELECT
            CAST(sum(CASE WHEN s.sp = 'val' AND s.ms <=
              (SELECT mx FROM g WHERE sp = 'train') THEN 1 ELSE 0 END)
              AS BIGINT) AS l0,
            CAST(sum(CASE WHEN s.sp = 'test' AND s.ms <=
              (SELECT mx FROM g WHERE sp = 'val') THEN 1 ELSE 0 END)
              AS BIGINT) AS l1
          FROM s)
        SELECT 'train' AS from_split, 'val' AS to_split, t.n AS n_from,
          v.n AS n_to, t.mx AS from_max_ms, v.mn AS to_min_ms,
          t.mx < v.mn AS boundary_ok,
          CAST(greatest(0, t.mx - v.mn) AS BIGINT) AS overlap_ms,
          l.l0 AS n_leaked
        FROM (SELECT * FROM g WHERE sp = 'train') t,
          (SELECT * FROM g WHERE sp = 'val') v, l
        UNION ALL
        SELECT 'val', 'test', v.n, x.n, v.mx, x.mn, v.mx < x.mn,
          CAST(greatest(0, v.mx - x.mn) AS BIGINT), l.l1
        FROM (SELECT * FROM g WHERE sp = 'val') v,
          (SELECT * FROM g WHERE sp = 'test') x, l""")),

    // Single-scan numeric profile of lineitem money/quantity columns:
    // nulls, min/max, exact sums, mean/variance from DECIMAL power sums.
    Query("q206_numeric_profile",
      (s, dir) => graft.operators.ProfileOps.numericProfile(
        t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("quantity"),
          cents(col("l_extendedprice")).as("price_cents"),
          tenthCents(col("l_tax")).as("tax_tenths")),
        Seq("quantity", "price_cents", "tax_tenths")),
      Some(numericProfileSql)),

    // Vocabulary coverage curve: token-mass share of the top-k types at
    // four vocab sizes — distributed (count desc, term) rank, one
    // conditional-sum agg.
    Query("q208_vocab_coverage",
      (s, dir) => graft.operators.TokenizerOps.vocabCoverage(
        t(s, dir, "documents"), "text", Seq(10, 100, 1000, 5000)),
      Some("""WITH tk AS (
          SELECT unnest(list_filter(
            regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
            AS term
          FROM documents),
        tc AS (SELECT term, CAST(count(*) AS BIGINT) AS n
          FROM tk GROUP BY 1),
        r AS (SELECT n,
            row_number() OVER (ORDER BY n DESC, term) AS rk FROM tc),
        t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS total,
            CAST(count(*) AS BIGINT) AS n_types FROM tc),
        c AS (
          SELECT 10 AS k, CAST(coalesce((SELECT sum(n) FROM r
            WHERE rk <= 10), 0) AS BIGINT) AS cov
          UNION ALL SELECT 100, CAST(coalesce((SELECT sum(n) FROM r
            WHERE rk <= 100), 0) AS BIGINT)
          UNION ALL SELECT 1000, CAST(coalesce((SELECT sum(n) FROM r
            WHERE rk <= 1000), 0) AS BIGINT)
          UNION ALL SELECT 5000, CAST(coalesce((SELECT sum(n) FROM r
            WHERE rk <= 5000), 0) AS BIGINT))
        SELECT CAST(k AS BIGINT) AS k, n_types, cov AS covered_tokens,
          total AS total_tokens,
          CASE WHEN total = 0 THEN NULL
            ELSE CAST(cov * 1000 // total AS BIGINT) END
            AS coverage_permille
        FROM c CROSS JOIN t""")),

    // Per-column value drift between documents and a degraded snapshot
    // (every 5th lang rewritten, every 7th dropped to NULL — so the
    // NULL-is-its-own-bucket contract is exercised against the oracle):
    // fnv1a64 low-bit buckets, PSI per column — lang drifts, source ~0.
    Query("q207_column_drift",
      (s, dir) => {
        val a = t(s, dir, "documents")
        val b = a.withColumn("lang",
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .when(col("doc_id") % 5 === 0, lit("xx"))
            .otherwise(col("lang")))
        graft.operators.ProfileOps.columnDrift(
          a, b, Seq("lang", "source"), buckets = 64)
      },
      Some(columnDriftSql)),

    // ---- round-14 batch B: multi-rater QA / bootstrap / seasonality --

    // Fleiss' kappa over 3 synthetic raters per order (mostly agreeing,
    // every-7th deviation): exact integer chain, limb-cast divisions.
    Query("q215_fleiss_kappa",
      (s, dir) => graft.operators.Stats.fleissKappa(
        t(s, dir, "orders")
          .withColumn("r", explode(array(lit(0), lit(1), lit(2))))
          .select(col("o_orderkey").as("item"),
            ((col("o_orderkey") % 3 +
              when((col("o_orderkey") + col("r")) % 7 === 0, 1)
                .otherwise(0)) % 3).as("label")),
        "item", "label"),
      Some(s"""WITH ratings AS (SELECT o_orderkey AS item,
          |    (o_orderkey % 3 + CASE WHEN (o_orderkey + r) % 7 = 0
          |      THEN 1 ELSE 0 END) % 3 AS label
          |  FROM orders, generate_series(0, 2) AS t(r)),
          |grid AS (SELECT item, label, CAST(count(*) AS HUGEINT) AS c
          |  FROM ratings GROUP BY 1, 2),
          |items AS (SELECT item, sum(c) AS r, sum(c * c) AS s2i
          |  FROM grid GROUP BY 1),
          |ia AS (SELECT CAST(count(*) AS HUGEINT) AS n_i, min(r) AS rmn,
          |    max(r) AS n, sum(s2i) AS s2
          |  FROM items),
          |la AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(t * t) AS t2
          |  FROM (SELECT label, sum(c) AS t FROM grid GROUP BY 1)),
          |j AS (SELECT * FROM ia CROSS JOIN la)
          |SELECT CAST(n_i AS BIGINT) AS n_items,
          |  CAST(n AS BIGINT) AS n_raters, k AS n_categories,
          |  CASE WHEN n <= 1 THEN NULL
          |    ELSE ${limbSql("s2 - n_i * n")}
          |      / ${limbSql("n_i * n * (n - 1)")} END AS p_bar,
          |  ${limbSql("t2")} / ${limbSql("n_i * n * n_i * n")} AS p_e,
          |  CASE WHEN n <= 1
          |      OR (n - 1) * (n_i * n * n_i * n - t2) = 0 THEN NULL
          |    ELSE ${limbSql("(s2 - n_i * n) * n_i * n - t2 * (n - 1)")}
          |      / ${limbSql("(n - 1) * (n_i * n * n_i * n - t2)")}
          |    END AS kappa
          |FROM j""".stripMargin)),

    // Deterministic Poisson-bootstrap CI of the mean event value per
    // type: 16 hash-replayable resamples, disc 5%/95% of the resample
    // means; the original mean rides the same scan as replicate -1.
    Query("q216_bootstrap_ci",
      (s, dir) => graft.operators.SamplingOps.bootstrapCi(
        graft.core.Tables.normalizeTs(t(s, dir, "events"), "ts")
          .select(col("event_type"), col("event_id"),
            cents(col("value")).as("cents")),
        "event_type", "cents", "event_id", b = 16),
      Some(bootstrapCiSql(b = 16, lo = 50, hi = 950, salt = "boot"))),

    // Weekly seasonality profile per event type: (dow, hour) grid with
    // exact expected-vs-actual ratio permille under independence.
    Query("q217_seasonal_profile",
      (s, dir) => graft.operators.TimeSeriesOps.seasonalProfile(
        graft.core.Tables.normalizeTs(t(s, dir, "events"), "ts"),
        "event_type", "ts"),
      Some("""WITH g AS (SELECT event_type,
            CAST((((epoch_ms(ts) // 86400000 + 4) % 7) + 7) % 7 AS INT)
              AS dow,
            CAST((((epoch_ms(ts) // 3600000) % 24) + 24) % 24 AS INT)
              AS hour,
            CAST(count(*) AS HUGEINT) AS n
          FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
          GROUP BY 1, 2, 3),
        w AS (SELECT event_type, dow, hour, n,
            sum(n) OVER (PARTITION BY event_type) AS kt,
            sum(n) OVER (PARTITION BY dow, hour) AS st
          FROM g),
        t AS (SELECT CAST(sum(n) AS HUGEINT) AS grand FROM g)
        SELECT event_type, dow, hour, CAST(n AS BIGINT) AS n,
          CAST(kt AS BIGINT) AS key_total,
          CAST(st AS BIGINT) AS slot_total,
          CAST(n * grand * 1000 // (kt * st) AS BIGINT)
            AS ratio_permille
        FROM w CROSS JOIN t""")),

    // Split-conformal calibration audit at 10% miscoverage: threshold
    // from a 20% hash-split calibration frame (exact finite-sample
    // rank), achieved coverage on the rest — integer cents scores.
    Query("q223_conformal_coverage",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"), cents(col("value")).as("score"))
        graft.operators.LabelQaOps.conformalCoverage(
          e.filter(col("event_id") % 5 === 0),
          e.filter(col("event_id") % 5 =!= 0),
          "score", alphaPermille = 100)
      },
      Some("""WITH cal AS (SELECT
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
          FROM events WHERE event_id % 5 = 0 AND value IS NOT NULL),
        cg AS (SELECT v, CAST(count(*) AS BIGINT) AS c
          FROM cal GROUP BY 1),
        cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
            AS cum, CAST(sum(c) OVER () AS BIGINT) AS n
          FROM cg),
        thr AS (SELECT min(v) AS threshold, max(n) AS n_cal
          FROM cum
          WHERE cum >= least(((n + 1) * 900 + 999) // 1000, n)),
        ev AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
          FROM events WHERE event_id % 5 <> 0 AND value IS NOT NULL),
        ec AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
            CAST(sum(CASE WHEN v <= threshold THEN 1 ELSE 0 END)
              AS BIGINT) AS n_covered
          FROM ev CROSS JOIN thr)
        SELECT coalesce(n_cal, 0) AS n_cal, threshold,
          coalesce(n_eval, 0) AS n_eval,
          coalesce(n_covered, 0) AS n_covered,
          CAST(CASE WHEN coalesce(n_eval, 0) = 0 THEN NULL
            ELSE n_covered * 1000 // n_eval END AS BIGINT)
            AS coverage_permille
        FROM thr CROSS JOIN ec""")),

    // Confident-learning label-noise census over synthesized
    // (given, predicted, confidence) labels: per-class mean-confidence
    // thresholds via exact integer cross-multiply, bounded 25-cell grid.
    Query("q224_confident_learning",
      (s, dir) => graft.operators.LabelQaOps.confidentLearningGrid(
        t(s, dir, "orders").select(
          concat(lit("P"), ((col("o_orderkey") + col("o_custkey")) % 5)
            .cast("string")).as("given"),
          concat(lit("P"), (col("o_orderkey") % 5).cast("string"))
            .as("pred"),
          ((col("o_orderkey") * 37) % 1000).cast("long").as("conf")),
        "given", "pred", "conf"),
      Some("""WITH r AS (SELECT
            'P' || CAST((o_orderkey + o_custkey) % 5 AS VARCHAR) AS g,
            'P' || CAST(o_orderkey % 5 AS VARCHAR) AS p,
            CAST((o_orderkey * 37) % 1000 AS BIGINT) AS conf
          FROM orders),
        t AS (SELECT g AS tg, CAST(count(*) AS HUGEINT) AS tn,
            CAST(sum(conf) AS HUGEINT) AS ts
          FROM r GROUP BY 1)
        SELECT g AS given_label, p AS pred_label,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN CAST(conf AS HUGEINT) * tn >= ts
            THEN 1 ELSE 0 END) AS BIGINT) AS n_confident
        FROM r LEFT JOIN t ON r.p = t.tg
        GROUP BY 1, 2""")),

    // Expected-calibration-error report over synthesized stated
    // confidences: fixed-width bins, exact per-bin conf/acc permille,
    // broadcast ECE total.
    Query("q225_calibration_bins",
      (s, dir) => graft.operators.LabelQaOps.calibrationBins(
        t(s, dir, "events").select(
          ((col("event_id") * 37) % 1001).cast("long").as("conf"),
          (((col("event_id") * 13) % 1000) <
            ((col("event_id") * 37) % 1001)).as("ok")),
        "conf", "ok", bins = 10),
      Some("""WITH r AS (SELECT
            CAST((event_id * 37) % 1001 AS BIGINT) AS conf,
            ((event_id * 13) % 1000) < ((event_id * 37) % 1001) AS ok
          FROM events),
        g AS (SELECT CAST(least(conf * 10 // 1000, 9) AS INT) AS bin,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(conf) AS BIGINT) AS sc,
            CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS nc
          FROM r GROUP BY 1),
        m AS (SELECT bin, n,
            CAST(sc // n AS BIGINT) AS conf_permille,
            CAST(nc * 1000 // n AS BIGINT) AS acc_permille,
            CAST(abs(nc * 1000 // n - sc // n) AS BIGINT)
              AS gap_permille
          FROM g),
        t AS (SELECT CAST(sum(n * gap_permille) // sum(n) AS BIGINT)
            AS ece_permille
          FROM m)
        SELECT bin, n, conf_permille, acc_permille, gap_permille,
          ece_permille
        FROM m CROSS JOIN t""")),

    // Per-flag 10/90-trimmed mean of extended price (cents): keyed
    // rank window, exact integer trim cuts, one limb division.
    Query("q226_trimmed_mean",
      (s, dir) => graft.operators.Stats.trimmedMeanByGroup(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("cents"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("tie")),
        "l_returnflag", "cents", "tie",
        loPermille = 100, hiPermille = 900),
      Some(s"""WITH r AS (SELECT l_returnflag AS g,
           |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
           |    l_orderkey * 8 + l_linenumber AS t
           |  FROM lineitem),
           |w AS (SELECT g, v,
           |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
           |    count(*) OVER (PARTITION BY g) AS n
           |  FROM r),
           |k AS (SELECT g, n, v,
           |    (rn > 100 * n // 1000 AND rn <= n - 100 * n // 1000)
           |      AS kept
           |  FROM w),
           |a AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_kept,
           |    CAST(sum(CASE WHEN kept THEN v ELSE 0 END) AS HUGEINT)
           |      AS s
           |  FROM k GROUP BY 1)
           |SELECT g AS l_returnflag, n, n_kept,
           |  CASE WHEN n_kept = 0 THEN NULL
           |    ELSE ${limbSql("s")}
           |      / ${limbSql("CAST(n_kept AS HUGEINT)")} END
           |    AS trimmed_mean
           |FROM a""".stripMargin)),

    // Atkinson (eps=2) inequality index of order value (cents) per
    // priority: quantized integer reciprocals, exact sums, limb-cast
    // fixed double chain — no transcendental in either engine.
    Query("q227_atkinson_index",
      (s, dir) => graft.operators.Stats.atkinsonIndex(
        t(s, dir, "orders").select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("cents")),
        "o_orderpriority", "cents"),
      Some(s"""WITH r AS (SELECT o_orderpriority AS g,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
           |  FROM orders
           |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
           |a AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s,
           |    CAST(sum(1000000000000 // v) AS HUGEINT) AS q
           |  FROM r GROUP BY 1)
           |SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
           |  1.0 - (${limbSql("n * 1000000000000")} / ${limbSql("q")})
           |    * (${limbSql("n")} / ${limbSql("s")}) AS atkinson
           |FROM a""".stripMargin)),

    // Per-status median + MAD of extended price (cents): two keyed
    // rank windows, disc ranks at (n+1) div 2, exact integers.
    Query("q228_median_mad",
      (s, dir) => graft.operators.Stats.madByGroup(
        t(s, dir, "lineitem").select(col("l_linestatus"),
          cents(col("l_extendedprice")).as("cents"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("tie")),
        "l_linestatus", "cents", "tie"),
      Some("""WITH r AS (SELECT l_linestatus AS g,
            CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
            l_orderkey * 8 + l_linenumber AS t
          FROM lineitem),
        w1 AS (SELECT g, v, t,
            row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
            count(*) OVER (PARTITION BY g) AS n
          FROM r),
        med AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
            min(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median
          FROM w1 GROUP BY 1),
        d AS (SELECT r.g, med.n, med.median, abs(r.v - med.median) AS dv,
            r.v, r.t
          FROM r JOIN med ON r.g = med.g),
        w2 AS (SELECT g, n, median, dv,
            row_number() OVER (PARTITION BY g ORDER BY dv, v, t) AS rn
          FROM d)
        SELECT g AS l_linestatus, CAST(max(n) AS BIGINT) AS n,
          CAST(max(median) AS BIGINT) AS median,
          CAST(min(CASE WHEN rn = (n + 1) // 2 THEN dv END) AS BIGINT)
            AS mad
        FROM w2 GROUP BY 1"""))
  )

  /** DuckDB twin of [[graft.operators.SamplingOps.bootstrapCi]] on the
    * (event_type, cents, event_id) projection: the same uniformHash
    * replicate weights against the SAME JVM-computed Poisson CDF double
    * literals, limb-cast resample means, disc-percentile selection. */
  private def bootstrapCiSql(b: Int, lo: Int, hi: Int,
      salt: String): String = {
    val cdf = graft.operators.SamplingOps.poissonCdf
    val wExpr = cdf.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH v AS (SELECT event_type AS g, event_id AS id,
       |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
       |  FROM events
       |  WHERE event_id IS NOT NULL AND value IS NOT NULL),
       |e AS (SELECT g, id, x, r AS b
       |  FROM v, generate_series(-1, ${b - 1}) AS t(r)),
       |uu AS (SELECT g, b, x,
       |    ${HashOracleSql.uniformSql(
            "CAST(id AS VARCHAR) || '#' || CAST(b AS VARCHAR)", salt)}
       |      AS u
       |  FROM e),
       |ww AS (SELECT g, b, x,
       |    CASE WHEN b = -1 THEN 1 ELSE $wExpr END AS w
       |  FROM uu),
       |grid AS (SELECT g, b, CAST(sum(w) AS HUGEINT) AS n,
       |    sum(CAST(w AS HUGEINT) * x) AS s
       |  FROM ww GROUP BY 1, 2
       |  HAVING sum(w) > 0),
       |means AS (SELECT g, b, n,
       |    ${limbSql("s")} / ${limbSql("n")} AS mean
       |  FROM grid),
       |boots AS (SELECT g, b, mean,
       |    row_number() OVER (PARTITION BY g ORDER BY mean, b) AS r,
       |    count(*) OVER (PARTITION BY g) AS nb
       |  FROM means WHERE b >= 0),
       |sel AS (SELECT g,
       |    max(CASE WHEN r = greatest(($lo * nb + 999) // 1000, 1)
       |      THEN mean END) AS boot_lo,
       |    max(CASE WHEN r = greatest(($hi * nb + 999) // 1000, 1)
       |      THEN mean END) AS boot_hi,
       |    CAST(max(nb) AS BIGINT) AS n_boot
       |  FROM boots GROUP BY 1)
       |SELECT m.g AS event_type, CAST(m.n AS BIGINT) AS n, m.mean,
       |  sel.boot_lo, sel.boot_hi, coalesce(sel.n_boot, 0) AS n_boot
       |FROM means m LEFT JOIN sel ON m.g = sel.g
       |WHERE m.b = -1""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.ProfileOps.numericProfile]] on the
    * three lineitem money/quantity columns — one moment CTE per column,
    * the identical fixed double chain. */
  private def numericProfileSql: String = {
    val colsDef = Seq(
      "quantity" -> "CAST(l_quantity AS BIGINT)",
      "price_cents" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
      "tax_tenths" -> "CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)")
    val ctes = colsDef.map { case (n, _) =>
      s"""m_$n AS (SELECT count(*) AS nr, count($n) AS c,
         |    min($n) AS mn, max($n) AS mx,
         |    sum(CAST($n AS HUGEINT)) AS s1,
         |    sum(CAST($n AS HUGEINT) * $n) AS s2
         |  FROM v)""".stripMargin
    }.mkString(",\n")
    val selects = colsDef.map { case (n, _) =>
      s"""SELECT '$n' AS col_name, CAST(nr AS BIGINT) AS n_rows,
         |  CAST(nr - c AS BIGINT) AS n_nulls, mn AS min_v, mx AS max_v,
         |  CAST(s1 AS BIGINT) AS sum_v,
         |  CASE WHEN c = 0 THEN NULL
         |    ELSE CAST(s1 // c::HUGEINT AS BIGINT) END AS mean_v,
         |  CASE WHEN c = 0 THEN NULL
         |    ELSE CAST((c::HUGEINT * s2 - s1 * s1)
         |      // (c::HUGEINT * c::HUGEINT) AS BIGINT) END AS variance_v
         |FROM m_$n""".stripMargin
    }.mkString("\nUNION ALL\n")
    val proj = colsDef.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
    s"""WITH v AS (SELECT
       |    $proj
       |  FROM lineitem),
       |$ctes
       |$selects""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.ProfileOps.columnDrift]] on the
    * (lang, source) snapshot pair — fnv1a64 low-6-bit buckets (64
    * divides 2^64, so unsigned mod == Spark's signed pmod) and the PSI
    * quantized-ln chain per column. */
  private def columnDriftSql: String = {
    def side(table: String, cnt: String): String =
      Seq("lang", "source").map { c =>
        // COALESCE to -1: NULL values are their own bucket on the Spark
        // side, and a NULL bucket key would never match itself through
        // FULL OUTER JOIN ... USING — the ref/cur null counts would land
        // in two separate grid rows with different nb and PSI terms
        s"""SELECT '$c' AS col_name,
           |  COALESCE(CAST(${HashOracleSql.fnv1a64(c)} % 64 AS BIGINT),
           |    -1) AS bucket,
           |  CAST(count(*) AS BIGINT) AS $cnt
           |FROM $table GROUP BY 2""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH bsrc AS (SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN NULL
       |      WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
       |    source
       |  FROM documents),
       |ga AS (${side("documents", "n_ref")}),
       |gb AS (${side("bsrc", "n_cur")}),
       |g AS (SELECT col_name, bucket,
       |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
       |  FROM ga FULL OUTER JOIN gb USING (col_name, bucket)),
       |t AS (SELECT col_name, n_ref, n_cur,
       |    sum(n_ref) OVER (PARTITION BY col_name) AS tr,
       |    sum(n_cur) OVER (PARTITION BY col_name) AS tc,
       |    count(*) OVER (PARTITION BY col_name) AS nb
       |  FROM g),
       |q AS (SELECT col_name, tr, tc,
       |    CAST(floor((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE)
       |        - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE))
       |      * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE))
       |        / (CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE)))
       |      * 1e7 + 0.5) AS BIGINT) AS pq
       |  FROM t)
       |SELECT col_name, CAST(max(tr) AS BIGINT) AS n_ref,
       |  CAST(max(tc) AS BIGINT) AS n_cur,
       |  CAST(sum(pq) AS DOUBLE) / 1e7 AS psi
       |FROM q GROUP BY 1""".stripMargin
  }

  /** DuckDB twin of the q204 PII census — the q47 redaction recipe
    * (patterns pass through backslash-verbatim) grouped by segment. */
  private def piiCensusSql: String = {
    val redact = TextOps.piiPatterns.foldLeft("raw") {
      case (e, (pat, repl)) =>
        val p = pat.replace("'", "''")
        s"regexp_replace($e, '$p', '$repl', 'g')"
    }
    def cnt(tok: String) =
      s"CAST((length(redacted) - length(replace(redacted, '$tok', '')))" +
        s" / ${tok.length} AS BIGINT)"
    s"""WITH raws AS (
       |  SELECT c_mktsegment AS seg,
       |    CASE WHEN c_custkey % 4 = 0 THEN c_mktsegment || ' clean note'
       |    ELSE c_mktsegment || ' contact ' || c_name
       |      || '@example.com ip 10.0.0.' || (c_custkey % 256)
       |      || ' phone 25-'
       |      || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-'
       |      || lpad((c_custkey % 997)::VARCHAR, 3, '0') || '-'
       |      || lpad((c_custkey % 9973)::VARCHAR, 4, '0') END AS raw
       |  FROM customer),
       |red AS (SELECT seg, $redact AS redacted FROM raws),
       |c AS (SELECT seg, ${cnt("<EMAIL>")} AS e, ${cnt("<IP>")} AS i,
       |    ${cnt("<PHONE>")} AS p
       |  FROM red)
       |SELECT seg AS source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_with_pii,
       |  CAST(sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) * 1000
       |    // count(*) AS BIGINT) AS pii_permille,
       |  CAST(sum(e) AS BIGINT) AS n_emails,
       |  CAST(sum(i) AS BIGINT) AS n_ips,
       |  CAST(sum(p) AS BIGINT) AS n_phones
       |FROM c GROUP BY seg""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.RankFusionOps.rankedEval]] at
    * k = 10 — the discount/IDCG integers are the JVM's
    * [[graft.operators.RankFusionOps.dcgDiscounts]] values embedded as
    * VALUES literals, so neither engine computes a logarithm. */
  private def rankedEvalSql: String = {
    val disc = graft.operators.RankFusionOps.dcgDiscounts(10)
    val dVals = disc.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
    val iVals = disc.scanLeft(0L)(_ + _).zipWithIndex
      .map { case (s0, j) => s"($j, $s0)" }.mkString(", ")
    s"""WITH r AS (
       |  SELECT source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS rnk,
       |    (lang = 'en') AS rel
       |  FROM documents),
       |d(rnk, disc) AS (VALUES $dVals),
       |i(j, idcg) AS (VALUES $iVals),
       |a AS (SELECT source,
       |    CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
       |    CAST(sum(CASE WHEN rel AND r.rnk <= 10 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS rel_at_k,
       |    min(CASE WHEN rel THEN r.rnk END) AS fr,
       |    CAST(sum(CASE WHEN rel AND r.rnk <= 10 THEN d.disc ELSE 0
       |      END) AS BIGINT) AS dcg
       |  FROM r LEFT JOIN d ON r.rnk = d.rnk GROUP BY 1)
       |SELECT source, n_rel, rel_at_k,
       |  CAST(rel_at_k AS DOUBLE) / 10.0 AS p_at_k,
       |  CASE WHEN fr IS NULL THEN NULL
       |    ELSE 1.0 / CAST(fr AS DOUBLE) END AS mrr,
       |  CASE WHEN n_rel = 0 THEN NULL
       |    ELSE CAST(dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE) END AS ndcg
       |FROM a JOIN i ON least(n_rel, 10) = i.j""".stripMargin
  }

  /** One unrolled personalized-PageRank iteration (DuckDB) — the q93
    * prIter recipe with the restart mass conditional on the seed rule
    * (node % 50 = 0), mirroring
    * [[graft.operators.GraphOps.personalizedPageRank]]'s integer
    * recurrence bit-for-bit. */
  private def pprIter(i: Int): String =
    s"""m$i AS (
       |  SELECT p.dst AS node, sum(r.rank // d.deg) AS s
       |  FROM pairs p JOIN r${i - 1} r ON p.src = r.node
       |  JOIN outdeg d ON d.src = p.src
       |  GROUP BY p.dst),
       |r$i AS (
       |  SELECT n.node,
       |    CAST((CASE WHEN n.node % 50 = 0 THEN 150000000 ELSE 0 END)
       |      + (17 * coalesce(m.s, 0)) // 20 AS BIGINT) AS rank
       |  FROM nodes n LEFT JOIN m$i m ON n.node = m.node)""".stripMargin

  /** DuckDB twin of [[graft.operators.Stats.benfordAudit]] on lineitem
    * prices — the log10(1+1/d) literals are the JVM's
    * [[graft.operators.Stats.BenfordP]] doubles, printed shortest-
    * round-trip so DuckDB parses back the identical double. */
  private def benfordSql: String = {
    val bp = graft.operators.Stats.BenfordP
    val digitCols = (1 to 9).map { d =>
      s"""CAST(sum(CASE WHEN c > 0 AND substr(CAST(c AS VARCHAR), 1, 1)
         | = '$d' THEN 1 ELSE 0 END) AS BIGINT) AS d$d""".stripMargin
    }.mkString(",\n    ")
    val chiTerms = (1 to 9).map { d =>
      val p = bp(d - 1)
      s"""CAST(floor((CAST(d$d AS DOUBLE) - CAST(n AS DOUBLE) * $p)
         | * (CAST(d$d AS DOUBLE) - CAST(n AS DOUBLE) * $p)
         | / (CAST(n AS DOUBLE) * $p) * 1e7 + 0.5) AS HUGEINT)""".stripMargin
    }.mkString(" + ")
    s"""WITH v AS (SELECT l_returnflag AS g,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
       |  FROM lineitem),
       |a AS (SELECT g,
       |    CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN c IS NULL OR c <= 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_skipped,
       |    $digitCols
       |  FROM v GROUP BY 1)
       |SELECT g AS l_returnflag, n, n_skipped,
       |  d1, d2, d3, d4, d5, d6, d7, d8, d9,
       |  CASE WHEN n = 0 THEN NULL
       |    ELSE CAST($chiTerms AS DOUBLE) / 1e7 END AS chi2
       |FROM a""".stripMargin
  }

  /** One BM25 top-200 ranking CTE pair (`sc$tag`, `r$tag`) over shared
    * `toks`/`dl`/`stats` — the q63 scoring replayed per term set, ranked
    * (bm25_q DESC, doc_id) and cut to 200 via QUALIFY. */
  private def bm25RankCte(tag: String, terms: Seq[String]): String = {
    val in = terms.map(t => s"'$t'").mkString(", ")
    s"""tf$tag AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
       |  WHERE term IN ($in)
       |  GROUP BY doc_id, term),
       |dfs$tag AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM tf$tag GROUP BY term),
       |c$tag AS (
       |  SELECT t.doc_id,
       |    CAST(floor(
       |      ln(1.0 + (n - df + 0.5) / (df + 0.5))
       |      * (tf * (CAST(1.2 AS DOUBLE) + 1.0))
       |      / (tf + CAST(1.2 AS DOUBLE) *
       |         (1.0 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
       |          (CAST(dl AS DOUBLE) / (CAST(dlsum AS DOUBLE) / n))))
       |      * 1e7 + 0.5) AS BIGINT) AS cq
       |  FROM tf$tag t JOIN dl USING (doc_id)
       |  CROSS JOIN stats JOIN dfs$tag USING (term)),
       |sc$tag AS (SELECT doc_id, CAST(sum(cq) AS BIGINT) AS bm25_q
       |  FROM c$tag GROUP BY doc_id),
       |r$tag AS (SELECT doc_id, row_number() OVER (
       |    ORDER BY bm25_q DESC, doc_id) AS rank_$tag
       |  FROM sc$tag
       |  QUALIFY rank_$tag <= 200)""".stripMargin
  }

  /** DuckDB twin of [[TextOps.gopherQualityRules]] + keep. */
  private def gopherRulesSql: String = {
    val stopHits = TextOps.gopherStopWords.map { kw =>
      s"(CASE WHEN list_contains(lwords, '$kw') THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH base AS (
        SELECT doc_id, text,
          list_filter(regexp_split_to_array(text, '\\s+'),
            w -> w <> '') AS words,
          str_split(text, chr(10)) AS lines
        FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(words) AS INTEGER) AS n_words,
          CAST(list_sum(list_transform(words, w -> length(w)))
            AS DOUBLE) / len(words) AS mean_word_len,
          (length(text) - length(replace(text, '#', ''))) +
            (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym,
          len(lines) AS n_lines,
          len(list_filter(lines,
            l -> regexp_matches(trim(l), '^[-*]'))) AS bullet_lines,
          len(list_filter(lines,
            l -> regexp_matches(trim(l), '\\.\\.\\.${"$"}'))) AS ellipsis_lines,
          len(list_filter(words,
            w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
          list_transform(words, w -> lower(w)) AS lwords
        FROM base),
      r AS (
        SELECT doc_id, n_words, mean_word_len,
          (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
          (n_words > 0 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0)
            AS rule_mean_word_len,
          (n_words > 0 AND CAST(n_sym AS DOUBLE) / n_words < 0.1)
            AS rule_symbol_ratio,
          (CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9)
            AS rule_bullet_lines,
          (CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3)
            AS rule_ellipsis_lines,
          (n_words > 0 AND CAST(alpha_words AS DOUBLE) / n_words >= 0.8)
            AS rule_alpha_words,
          ($stopHits >= 2) AS rule_stop_words
        FROM m)
      SELECT doc_id, n_words, mean_word_len, rule_word_count,
        rule_mean_word_len, rule_symbol_ratio, rule_bullet_lines,
        rule_ellipsis_lines, rule_alpha_words, rule_stop_words,
        (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
          AND rule_bullet_lines AND rule_ellipsis_lines
          AND rule_alpha_words AND rule_stop_words) AS keep
      FROM r"""
  }
}
