package graft.queries

/** DuckDB-SQL twins of the engine's deterministic hash primitives
  * ([[graft.operators.DedupOps.fnv1a64]] / [[graft.operators.DedupOps.splitmix64]]),
  * so the MinHash / SimHash near-duplicate operators can be hash-matched by
  * the driver's DuckDB oracle instead of falling back to rows-only checks.
  *
  * DuckDB has no wrapping 64-bit arithmetic (BIGINT/UBIGINT ops raise on
  * overflow), so everything runs mod 2^64 through HUGEINT (signed 128-bit):
  *  - additions: `(a + b) % 2^64` fits trivially;
  *  - multiplications: a 64x64 product can overflow even HUGEINT, so the
  *    constant is split into 32-bit halves:
  *      (a*c) mod 2^64 = (a*c_lo + ((a mod 2^32)*c_hi mod 2^32) << 32) mod 2^64
  *    with every intermediate < 2^97;
  *  - xor / shifts: native on UBIGINT;
  *  - the engine's signed-Long `min` in MinHash signatures: wrap UBIGINT
  *    back to signed BIGINT (subtract 2^64 above 2^63) before `min`.
  *
  * The emitted SQL is one self-contained statement (CTE chain) per query —
  * the driver executes oracles as single statements. All SQL is generated
  * from the SAME numeric constants as the Scala implementation; the document
  * text in the testdata is ASCII, so `unicode(char)` (code point) equals
  * the JVM's UTF-16 `charAt` code unit that fnv1a64 consumes.
  */
object HashOracleSql {

  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)

  // the same constants as DedupOps.fnv1a64 / splitmix64
  private val FnvOffset = u(0xcbf29ce484222325L)
  private val FnvPrime = u(0x100000001b3L)
  private val Golden = u(0x9e3779b97f4a7c15L)
  private val Mix1 = 0xbf58476d1ce4e5b9L
  private val Mix2 = 0x94d049bb133111ebL

  /** `(a * c) mod 2^64` with the 32-bit-split trick; `a` is a HUGEINT
    * expression in [0, 2^64). */
  private def mulmod(a: String, c: Long): String = {
    val big = BigInt(java.lang.Long.toUnsignedString(c))
    val hi = big >> 32
    val lo = big & 0xffffffffL
    s"(($a*$lo::HUGEINT + (($a%4294967296::HUGEINT)*$hi::HUGEINT)" +
      s"%4294967296::HUGEINT*4294967296::HUGEINT)%$M64)::UBIGINT"
  }

  /** fnv1a64 of a VARCHAR expression, as UBIGINT (list_reduce over chars —
    * the exact per-char xor/multiply chain of DedupOps.fnv1a64). */
  def fnv1a64(strExpr: String): String =
    s"""list_reduce(list_prepend($FnvOffset::HUGEINT,
       |      [unicode(c)::HUGEINT for c in string_split($strExpr,'')]),
       |      (acc,code) -> ((xor(acc::UBIGINT,code::UBIGINT))::HUGEINT * $FnvPrime::HUGEINT)
       |                    % $M64)::UBIGINT""".stripMargin

  /** `GOLDEN` as an unsigned SQL literal — for building splitmix64 inputs
    * `x0 = (h + (j+1)*GOLDEN) mod 2^64` (the finalizer below does NOT add
    * GOLDEN itself; callers fold the +1 in, mirroring minhashSigCtes). */
  def goldenU: String = Golden

  /** Generic splitmix64 finalizer as a CTE chain: reads CTE `pre` holding
    * carried columns `carry` plus `x` (UBIGINT in [0,2^64), already offset
    * by the appropriate GOLDEN multiples), emits CTE `out` with (`carry`,
    * `hu` UBIGINT, `h` BIGINT) — the unsigned and signed views of
    * splitmix64's output. Exactly the xor/multiply chain of
    * [[graft.operators.DedupOps.splitmix64]]. */
  def splitmixCtes(pre: String, carry: String, out: String): String = {
    val c = if (carry.isEmpty) "" else carry + ", "
    s"""${out}_a1 AS (SELECT ${c}xor(x, x>>30)::HUGEINT AS a FROM $pre),
       |${out}_m1 AS (SELECT ${c}${mulmod("a", Mix1)} AS x FROM ${out}_a1),
       |${out}_a2 AS (SELECT ${c}xor(x, x>>27)::HUGEINT AS a FROM ${out}_m1),
       |${out}_m2 AS (SELECT ${c}${mulmod("a", Mix2)} AS x FROM ${out}_a2),
       |$out AS (SELECT ${c}xor(x, x>>31) AS hu,
       |  CASE WHEN xor(x, x>>31) >= 9223372036854775808::UBIGINT
       |       THEN (xor(x, x>>31)::HUGEINT - $M64)::BIGINT
       |       ELSE xor(x, x>>31)::BIGINT END AS h FROM ${out}_m2)""".stripMargin
  }

  /** Tokenize + `shingleN`-gram CTEs over `documents` — identical semantics
    * to DedupOps.shingles (lowercase, \\s+ split, short docs collapse to one
    * shingle, empty docs to none), distinct per doc. Emits CTEs `toks`, `sh`. */
  def shingleCtes(n: Int): String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t)=0 THEN []
       |    WHEN len(t)<$n THEN [array_to_string(t,' ')]
       |    ELSE [${(0 until n).map(i => s"t[i+$i]").mkString("||' '||")}
       |          for i in generate_series(1, len(t)-${n - 1})] END) AS s
       |  FROM toks)""".stripMargin

  /** DuckDB twin of Spark `pmod(fnv1a64, buckets)` over a UBIGINT column
    * named `h`: reinterpret as signed 64-bit, then floor-mod to
    * [0, buckets) — the hashed-feature bucket every classifier/compare
    * op shares. */
  def bucketSql(buckets: Int): String =
    s"""((CASE WHEN h >= 9223372036854775808::UBIGINT
       |     THEN h::HUGEINT - $M64 ELSE h::HUGEINT END
       |  % $buckets::HUGEINT) + $buckets::HUGEINT) % $buckets::HUGEINT"""
      .stripMargin

  /** DuckDB twin of [[graft.operators.SamplingOps.uniformHash]]: top 53
    * bits of fnv1a64(key || ':' || salt) as an exact double in [0,1). */
  def uniformSql(strExpr: String, salt: String): String =
    s"(${fnv1a64(s"($strExpr || ':$salt')")} >> 11)::DOUBLE / 9007199254740992.0"

  /** CTE chain computing per-doc MinHash signatures (`allsig(doc_id, sig)`):
    * sig[j] = min over shingles of signed(splitmix64(fnv1a64(sh) + j*GOLDEN)),
    * docs without shingles get the all-Long.MaxValue signature — exactly
    * DedupOps.minhashSignature. */
  private def minhashSigCtes(numHashes: Int, shingleN: Int): String = {
    val jMax = numHashes - 1
    s"""${shingleCtes(shingleN)},
       |ex AS (SELECT doc_id, unnest(s) AS tok FROM sh),
       |hb AS (SELECT doc_id, ${fnv1a64("tok")} AS h FROM ex),
       |s0 AS (
       |  -- x0 of splitmix64(base + j*GOLDEN): the mix adds GOLDEN again, so (j+1)
       |  SELECT doc_id, j,
       |    ((h::HUGEINT + ((j::HUGEINT+1)*$Golden::HUGEINT) % $M64) % $M64)::UBIGINT AS x
       |  FROM hb, unnest(generate_series(0,$jMax)) AS t(j)),
       |sa1 AS (SELECT doc_id, j, xor(x, x>>30)::HUGEINT AS a FROM s0),
       |s1 AS (SELECT doc_id, j, ${mulmod("a", Mix1)} AS x FROM sa1),
       |sa2 AS (SELECT doc_id, j, xor(x, x>>27)::HUGEINT AS a FROM s1),
       |s2 AS (SELECT doc_id, j, ${mulmod("a", Mix2)} AS x FROM sa2),
       |s3 AS (SELECT doc_id, j,
       |    CASE WHEN xor(x,x>>31) >= 9223372036854775808::UBIGINT
       |         THEN (xor(x,x>>31)::HUGEINT - $M64)::BIGINT
       |         ELSE xor(x,x>>31)::BIGINT END AS h FROM s2),
       |minsig AS (SELECT doc_id, list(min_h ORDER BY j) AS sig FROM (
       |    SELECT doc_id, j, min(h) AS min_h FROM s3 GROUP BY doc_id, j)
       |  GROUP BY doc_id),
       |allsig AS (
       |  SELECT d.doc_id,
       |    coalesce(m.sig, [9223372036854775807::BIGINT for _ in generate_series(1,$numHashes)]) AS sig
       |  FROM documents d LEFT JOIN minsig m USING (doc_id))""".stripMargin
  }

  /** All-pairs banded-candidate CTE (`banded(id_a, id_b, shares, est_jaccard)`):
    * `shares` = the pair co-buckets in >= 1 of the LSH bands, `est_jaccard` =
    * signature agreement / numHashes — the naive statement of
    * DedupOps.minhashNearDuplicates' candidate + estimate semantics. */
  private def bandedPairCtes(numHashes: Int, bands: Int): String = {
    val rows = numHashes / bands
    s"""pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
       |  FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id),
       |banded AS (
       |  SELECT id_a, id_b,
       |    len(list_filter(generate_series(0,${bands - 1}),
       |        k -> sa[$rows*k+1:$rows*k+$rows] = sb[$rows*k+1:$rows*k+$rows])) > 0 AS shares,
       |    len(list_filter(generate_series(1,$numHashes), i -> sa[i] = sb[i])) / $numHashes.0 AS est_jaccard
       |  FROM pairs)""".stripMargin
  }

  /** Full oracle for DedupOps.minhashNearDuplicates: banded candidates with
    * agreement-estimated Jaccard >= threshold. */
  def minhashNearDupSql(
      numHashes: Int, shingleN: Int, bands: Int, threshold: Double): String =
    s"""WITH ${minhashSigCtes(numHashes, shingleN)},
       |${bandedPairCtes(numHashes, bands)}
       |SELECT id_a, id_b, est_jaccard FROM banded
       |WHERE shares AND est_jaccard >= $threshold""".stripMargin

  /** Oracle for the q30 pipeline: MinHash-LSH candidates (est >= candThreshold)
    * verified with EXACT n-gram Jaccard (|inter|/|union| over the true distinct
    * shingle sets) >= verifyThreshold — DedupOps.minhashNearDuplicates
    * followed by DedupOps.ngramJaccard. */
  def minhashThenExactJaccardSql(
      numHashes: Int, shingleN: Int, bands: Int,
      candThreshold: Double, verifyThreshold: Double): String =
    s"""WITH ${minhashSigCtes(numHashes, shingleN)},
       |${bandedPairCtes(numHashes, bands)},
       |cand AS (SELECT id_a, id_b FROM banded WHERE shares AND est_jaccard >= $candThreshold),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |    len(list_intersect(a.s, b.s)) AS n_inter,
       |    len(list_distinct(list_concat(a.s, b.s))) AS n_union
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b)
       |SELECT * FROM (
       |  SELECT id_a, id_b,
       |    CASE WHEN n_union = 0 THEN 0.0 ELSE n_inter / n_union END AS jaccard
       |  FROM verified)
       |WHERE jaccard >= $verifyThreshold""".stripMargin

  /** Oracle for DedupOps.simhashNearDuplicates: exact 64-bit SimHash
    * (per-token fnv1a64, bit votes over ALL token occurrences, sign bit
    * assembly) + all-pairs Hamming <= maxDist. The 8x8-bit banding in the
    * engine is complete for maxDist < 8 (pigeonhole: <= maxDist differing
    * bits touch <= maxDist of the 8 bands), so the naive all-pairs statement
    * IS the operator's semantics — a hash match proves both the signature
    * math and that banding loses no pair. */
  /** Full oracle for DedupOps.minhashNearDuplicatesAgainst (q51): incoming
    * slice (doc_id % incomingMod == 0) probed against the signatures of the
    * remaining corpus — banding restated as band-slice equality over the
    * replayed signatures, exactly like [[minhashNearDupSql]]. */
  def minhashAgainstSql(
      numHashes: Int, shingleN: Int, bands: Int,
      threshold: Double, incomingMod: Int): String = {
    val rows = numHashes / bands
    s"""WITH ${minhashSigCtes(numHashes, shingleN)},
       |pairs AS (
       |  SELECT a.doc_id AS incoming_id, b.doc_id AS corpus_id,
       |         a.sig AS sa, b.sig AS sb
       |  FROM allsig a, allsig b
       |  WHERE a.doc_id % $incomingMod = 0 AND b.doc_id % $incomingMod <> 0),
       |banded AS (
       |  SELECT incoming_id, corpus_id,
       |    len(list_filter(generate_series(0,${bands - 1}),
       |        k -> sa[$rows*k+1:$rows*k+$rows] = sb[$rows*k+1:$rows*k+$rows])) > 0 AS shares,
       |    len(list_filter(generate_series(1,$numHashes), i -> sa[i] = sb[i])) / $numHashes.0 AS est_jaccard
       |  FROM pairs)
       |SELECT incoming_id, corpus_id, est_jaccard FROM banded
       |WHERE shares AND est_jaccard >= $threshold""".stripMargin
  }

  /** Full oracle for [[graft.operators.SimilarityOps.lshTopK]] (q31):
    * replays the splitmix64 hyperplane signs (sign bit b of vector v =
    * [sum_j ±v_j > 0] with ± = bit 0 of splitmix64(b*1000003 + j)), the
    * banded candidate join, and the exact cosine re-rank. The sign sum is
    * an ORDERED left-to-right double fold (list_reduce), matching the
    * engine UDF's accumulation loop bit-for-bit; multiplying by ±1.0 is an
    * exact IEEE sign flip. */
  /** Shared SRP-banding CTEs (spl*…bnd): splitmix64 hyperplane signs, the
    * per-vector sign bits (ordered list_reduce fold = the UDF's loop) and
    * the band values — identical replay for [[srpLshTopKSql]] (q31) and
    * [[srpNearDupSql]] (q58). Ends without a trailing comma. */
  private def srpBandCtes(numBits: Int, bands: Int, dim: Int): String = {
    val rpb = numBits / bands
    s"""spl0 AS (
       |  SELECT b, j, ((b::HUGEINT*1000003::HUGEINT + j::HUGEINT) + $Golden::HUGEINT) % $M64 AS x
       |  FROM generate_series(0,${numBits - 1}) tb(b), generate_series(0,${dim - 1}) tj(j)),
       |spl1 AS (SELECT b, j, xor(x::UBIGINT, x::UBIGINT>>30)::HUGEINT AS a FROM spl0),
       |spl2 AS (SELECT b, j, ${mulmod("a", Mix1)} AS x FROM spl1),
       |spl3 AS (SELECT b, j, xor(x, x>>27)::HUGEINT AS a FROM spl2),
       |spl4 AS (SELECT b, j, ${mulmod("a", Mix2)} AS x FROM spl3),
       |sgn AS (SELECT b, j, CASE WHEN (xor(x, x>>31) & 1::UBIGINT) = 1::UBIGINT
       |    THEN 1.0 ELSE -1.0 END AS sg FROM spl4),
       |sgl AS (SELECT b, list(sg ORDER BY j) AS sg FROM sgn GROUP BY b),
       |bits AS (
       |  SELECT e.vec_id, s.b,
       |    CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
       |        list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), s.sg),
       |          p -> p[1] * p[2])),
       |      (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e, sgl s),
       |bnd AS (
       |  SELECT vec_id, b // $rpb AS band,
       |    CAST(sum(bit * (1 << (b % $rpb))) AS BIGINT) AS bandval
       |  FROM bits GROUP BY vec_id, b // $rpb)""".stripMargin
  }

  /** Full oracle for [[graft.operators.SimilarityOps.lshNearDuplicates]]
    * (q58): SRP banding over every vector, band-bucket candidate pairs
    * (id_a < id_b), exact double-precision cosine cut at `threshold`. */
  def srpNearDupSql(
      numBits: Int, bands: Int, dim: Int, threshold: Double): String =
    s"""WITH ${srpBandCtes(numBits, bands, dim)},
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bnd a JOIN bnd b
       |    ON a.band = b.band AND a.bandval = b.bandval
       |    AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b FROM cand
       |JOIN embeddings ea ON ea.vec_id = cand.id_a
       |JOIN embeddings eb ON eb.vec_id = cand.id_b
       |WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |  CAST(eb.embedding AS DOUBLE[])) >= $threshold""".stripMargin

  def srpLshTopKSql(
      numBits: Int, bands: Int, dim: Int, k: Int, qidMax: Int): String = {
    s"""WITH ${srpBandCtes(numBits, bands, dim)},
       |cand AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS id
       |  FROM bnd q JOIN bnd c ON q.band = c.band AND q.bandval = c.bandval
       |  WHERE q.vec_id < $qidMax
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT cand.qid, cand.id,
       |    list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
       |                           CAST(ec.embedding AS DOUBLE[])) AS cos
       |  FROM cand
       |  JOIN embeddings eq ON eq.vec_id = cand.qid
       |  JOIN embeddings ec ON ec.vec_id = cand.id),
       |ranked AS (SELECT qid, id, row_number() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, id ASC) AS rank FROM scored)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, id FROM ranked
       |WHERE rank <= $k""".stripMargin
  }

  /** Replay of the splitmix64-of-id centroid sample shared by
    * [[graft.operators.SimilarityOps.ivfTopK]] and
    * [[graft.operators.SimilarityOps.semanticDuplicates]] (their common
    * `sampleCentroids` helper): signed splitmix64 order, ties by id, first
    * `nCentroids` rows → CTE `cent(cvid, cvec, ci)` with 0-based ci. */
  private def centroidSampleCtes(nCentroids: Int): String =
    s"""h0 AS (
       |  SELECT vec_id, embedding,
       |    (vec_id::HUGEINT + $Golden::HUGEINT) % $M64 AS x
       |  FROM embeddings),
       |h1 AS (SELECT vec_id, embedding, xor(x::UBIGINT, x::UBIGINT>>30)::HUGEINT AS a FROM h0),
       |h2 AS (SELECT vec_id, embedding, ${mulmod("a", Mix1)} AS x FROM h1),
       |h3 AS (SELECT vec_id, embedding, xor(x, x>>27)::HUGEINT AS a FROM h2),
       |h4 AS (SELECT vec_id, embedding, ${mulmod("a", Mix2)} AS x FROM h3),
       |hs AS (SELECT vec_id, embedding,
       |    CASE WHEN xor(x, x>>31) >= 9223372036854775808::UBIGINT
       |         THEN (xor(x, x>>31)::HUGEINT - $M64)::BIGINT
       |         ELSE xor(x, x>>31)::BIGINT END AS h FROM h4),
       |cent AS (
       |  SELECT vec_id AS cvid, CAST(embedding AS DOUBLE[]) AS cvec,
       |    row_number() OVER (ORDER BY h, vec_id) - 1 AS ci
       |  FROM hs QUALIFY row_number() OVER (ORDER BY h, vec_id) <= $nCentroids)""".stripMargin

  /** Full oracle for [[graft.operators.SimilarityOps.ivfTopK]] (q38):
    * replays the splitmix64-of-id centroid sample (signed order, ties by
    * id), the nearest-centroid assignment (argmax cosine, first centroid
    * wins ties — row_number over (sim DESC, ci ASC)), the nProbe probe
    * lists, and the exact cosine re-rank inside probed lists. */
  def ivfTopKSql(nCentroids: Int, nProbe: Int, k: Int, qidMax: Int): String =
    s"""WITH ${centroidSampleCtes(nCentroids)},
       |sims AS (
       |  SELECT e.vec_id AS id, c.ci,
       |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS s
       |  FROM embeddings e CROSS JOIN cent c),
       |assign AS (SELECT id, ci AS cid FROM (
       |    SELECT id, ci, row_number() OVER (
       |      PARTITION BY id ORDER BY s DESC, ci ASC) AS rn FROM sims)
       |  WHERE rn = 1),
       |qprobe AS (SELECT id AS qid, ci AS cid FROM (
       |    SELECT id, ci, row_number() OVER (
       |      PARTITION BY id ORDER BY s DESC, ci ASC) AS rn FROM sims
       |    WHERE id < $qidMax)
       |  WHERE rn <= $nProbe),
       |cand AS (SELECT q.qid, a.id FROM qprobe q JOIN assign a ON a.cid = q.cid),
       |scored AS (
       |  SELECT cand.qid, cand.id,
       |    list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
       |                           CAST(ec.embedding AS DOUBLE[])) AS cos
       |  FROM cand JOIN embeddings eq ON eq.vec_id = cand.qid
       |            JOIN embeddings ec ON ec.vec_id = cand.id),
       |ranked AS (SELECT qid, id, row_number() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, id ASC) AS rank FROM scored)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, id FROM ranked
       |WHERE rank <= $k""".stripMargin

  /** Full oracle for [[graft.operators.SimilarityOps.semanticDuplicates]]
    * (q64): replays the centroid sample, the argmax assignment WITH its
    * winning similarity (c2c), the within-cluster >threshold pair scan, and
    * the keep-low-centroid-similarity victim rule (ties: higher id drops).
    * Both engines compare c2c values produced by the same left-to-right
    * d/na/nb loop (list_cosine_similarity == CosineSimilarity == cosSeq,
    * proven bit-identical by q37/q38/q58), so the victim CASE branches
    * agree exactly. */
  def semDedupSql(nClusters: Int, threshold: Double): String =
    s"""WITH ${centroidSampleCtes(nClusters)},
       |sims AS (
       |  SELECT e.vec_id AS id, c.ci,
       |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS s
       |  FROM embeddings e CROSS JOIN cent c),
       |assign AS (SELECT id, ci AS cid, s AS c2c FROM (
       |    SELECT id, ci, s, row_number() OVER (
       |      PARTITION BY id ORDER BY s DESC, ci ASC) AS rn FROM sims)
       |  WHERE rn = 1),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b, a.c2c AS c2c_a, b.c2c AS c2c_b
       |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.id < b.id
       |  JOIN embeddings ea ON ea.vec_id = a.id
       |  JOIN embeddings eb ON eb.vec_id = b.id
       |  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                               CAST(eb.embedding AS DOUBLE[]))
       |        > CAST($threshold AS DOUBLE)),
       |victims AS (
       |  SELECT DISTINCT CASE WHEN c2c_a < c2c_b THEN id_b
       |                       WHEN c2c_a > c2c_b THEN id_a
       |                       ELSE id_b END AS id
       |  FROM pairs)
       |SELECT a.id, CAST(a.cid AS BIGINT) AS cid,
       |       (v.id IS NOT NULL) AS dropped
       |FROM assign a LEFT JOIN victims v ON v.id = a.id""".stripMargin

  /** Full oracle for [[graft.operators.SamplingOps.dsirWeights]] (q65):
    * replays the hashed unigram+bigram features (fnv1a64 pmod'd on the
    * SIGNED value, matching Spark's pmod over LongType), the add-alpha
    * smoothed target/raw bucket multinomials, the per-(doc,bucket)
    * quantized log-ratio contributions (integer 1e-7 units — order-free
    * BIGINT sums, immune to the 1-ulp libm ln divergence), the quantized
    * Gumbel noise from the (id, salt) hash uniform, and the top-k
    * selection over non-target rows. Features are pure [a-z0-9 ] so the
    * unicode(c) fnv replay is exact even for non-ASCII documents. */
  def dsirSql(buckets: Int, alpha: Double, k: Int,
      targetPred: String, salt: String,
      table: String = "documents"): String = {
    val ab = alpha * buckets
    s"""WITH toks AS (
       |  SELECT doc_id, ($targetPred) AS is_target,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> x <> '') AS ts
       |  FROM $table),
       |feats AS (
       |  SELECT doc_id, is_target, unnest(ts) AS feat FROM toks
       |  UNION ALL
       |  SELECT doc_id, is_target, ts[i] || ' ' || ts[i+1] AS feat
       |  FROM toks, unnest(generate_series(1, len(ts)-1)) AS t(i)
       |  WHERE len(ts) >= 2),
       |fh AS (SELECT doc_id, is_target, ${fnv1a64("feat")} AS h FROM feats),
       |fb AS (SELECT doc_id, is_target,
       |    ((CASE WHEN h >= 9223372036854775808::UBIGINT
       |           THEN h::HUGEINT - $M64 ELSE h::HUGEINT END
       |      % $buckets::HUGEINT)
       |     + $buckets::HUGEINT) % $buckets::HUGEINT AS b FROM fh),
       |ndb AS (SELECT doc_id, is_target, b, CAST(count(*) AS BIGINT) AS n
       |  FROM fb GROUP BY doc_id, is_target, b),
       |bstats AS (SELECT b,
       |    CAST(sum(CASE WHEN is_target THEN n ELSE 0 END) AS BIGINT) AS tn,
       |    CAST(sum(n) AS BIGINT) AS rn
       |  FROM ndb GROUP BY b),
       |tot AS (SELECT CAST(sum(tn) AS BIGINT) AS tt,
       |               CAST(sum(rn) AS BIGINT) AS rt FROM bstats),
       |c AS (SELECT doc_id,
       |    CAST(floor(CAST(n AS DOUBLE) *
       |      (ln((CAST(tn AS DOUBLE) + $alpha) / (CAST(tt AS DOUBLE) + $ab))
       |       - ln((CAST(rn AS DOUBLE) + $alpha) / (CAST(rt AS DOUBLE) + $ab)))
       |      * 1e7 + 0.5) AS BIGINT) AS cq
       |  FROM ndb JOIN bstats USING (b) CROSS JOIN tot),
       |scores AS (SELECT doc_id, CAST(sum(cq) AS BIGINT) AS dsir_q
       |  FROM c GROUP BY doc_id),
       |perdoc AS (SELECT d.doc_id, ($targetPred) AS is_target,
       |    coalesce(s.dsir_q, 0) AS dsir_q
       |  FROM $table d LEFT JOIN scores s USING (doc_id)),
       |gum AS (SELECT doc_id,
       |    CAST(floor(-ln(-ln(
       |      ((${fnv1a64(s"(doc_id::VARCHAR || ':$salt')")} >> 11)::DOUBLE + 0.5)
       |      / 9007199254740992.0)) * 1e7 + 0.5) AS BIGINT) AS gq
       |  FROM $table),
       |sel AS (SELECT p.doc_id FROM perdoc p JOIN gum g USING (doc_id)
       |  WHERE NOT p.is_target
       |  ORDER BY p.dsir_q + g.gq DESC, p.doc_id LIMIT $k)
       |SELECT p.doc_id, p.is_target, p.dsir_q,
       |       (s.doc_id IS NOT NULL) AS selected
       |FROM perdoc p LEFT JOIN sel s USING (doc_id)""".stripMargin
  }

  /** Full oracle for [[graft.operators.TextOps.lmScoreAgainst]] over a
    * [[graft.operators.TextOps.lmIndex]] built on the target slice (q66):
    * replays the kind-prefixed hashed features ("u:w" / "b:w1 w2", signed
    * fnv1a64 pmod), the target count table, and the per-transition add-alpha
    * smoothed quantized log-probs (integer 1e-7 units — order-free BIGINT
    * sums; unseen buckets count 0 via left joins). */
  /** Full oracle for [[graft.operators.SimilarityOps.mmrSelect]] (q120):
    * relevance cosines against the vec_id=0 query, the (rel DESC, id)
    * top-`nCandidates` prefilter, then `k` unrolled greedy MMR rounds —
    * each the (score DESC, id) argmax of
    * `lambda*rel - (1-lambda)*max sim-to-selected`. The multiplier
    * literals are printed from the exact Scala doubles so both engines
    * compute identical IEEE products. */
  def mmrSql(k: Int, lambda: Double, nCandidates: Int): String = {
    val oneMinus = 1.0 - lambda
    val rounds = (2 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT $i AS rank, c2.id, c2.v, c2.rel,
         |    $lambda * c2.rel - $oneMinus *
         |      (SELECT max(list_cosine_similarity(c2.v, s.v))
         |       FROM sel${i - 1} s) AS score
         |  FROM c c2 WHERE c2.id NOT IN (SELECT id FROM sel${i - 1})
         |  ORDER BY score DESC, id LIMIT 1),
         |sel$i AS (SELECT id, v FROM sel${i - 1}
         |  UNION ALL SELECT id, v FROM p$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id = 0),
       |c AS MATERIALIZED (SELECT vec_id AS id,
       |    CAST(embedding AS DOUBLE[]) AS v,
       |    list_cosine_similarity(CAST(embedding AS DOUBLE[]),
       |      (SELECT v FROM qv)) AS rel
       |  FROM embeddings WHERE vec_id <> 0
       |  ORDER BY rel DESC, id LIMIT $nCandidates),
       |p1 AS MATERIALIZED (SELECT 1 AS rank, id, v, rel,
       |    $lambda * rel - $oneMinus * 0.0 AS score
       |  FROM c ORDER BY score DESC, id LIMIT 1),
       |sel1 AS (SELECT id, v FROM p1),
       |$rounds
       |SELECT CAST(rank AS INTEGER) AS rank, id, rel, score FROM (
       |${(1 to k).map(i => s"  SELECT rank, id, rel, score FROM p$i")
          .mkString("\n  UNION ALL\n")})
       |ORDER BY rank""".stripMargin
  }

  /** Full oracle for [[graft.operators.ClassifierOps.nbConfusion]]
    * (q118): hashed-unigram multinomial NB trained on `trainPred` rows of
    * `documents` (label = lang), classifying `testPred` rows — replays the
    * fnv bucket, the 1e-7-quantized log-probabilities (per-bucket excess
    * over the zero-count quantum + closed-form smoothing mass + prior)
    * and the (score DESC, label ASC) argmax. */
  def nbConfusionSql(buckets: Int, alpha: Double, trainPred: String,
      testPred: String): String = {
    val ab = alpha * buckets
    val pm = s"""((CASE WHEN h >= 9223372036854775808::UBIGINT
       |           THEN h::HUGEINT - $M64 ELSE h::HUGEINT END
       |      % $buckets::HUGEINT)
       |     + $buckets::HUGEINT) % $buckets::HUGEINT""".stripMargin
    s"""WITH tr AS (SELECT * FROM documents WHERE $trainPred),
       |te AS MATERIALIZED (SELECT * FROM documents WHERE $testPred),
       |ttok AS (SELECT lang,
       |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                       x -> x <> '')) AS tok
       |  FROM tr),
       |th AS (SELECT lang, ${fnv1a64("tok")} AS h FROM ttok),
       |cb AS MATERIALIZED (SELECT lang AS label, $pm AS b,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM th GROUP BY 1, 2),
       |prior AS MATERIALIZED (SELECT lang AS label,
       |    CAST(count(*) AS BIGINT) AS nd FROM tr GROUP BY 1),
       |tot AS MATERIALIZED (SELECT label, CAST(sum(c) AS BIGINT) AS tot
       |  FROM cb GROUP BY 1),
       |lab AS MATERIALIZED (SELECT p.label,
       |    CAST(floor(ln($alpha / (coalesce(t.tot, 0) + $ab)) * 1e7 + 0.5)
       |      AS BIGINT) AS q0,
       |    CAST(floor(ln(CAST(p.nd AS DOUBLE) /
       |        (SELECT sum(nd) FROM prior)) * 1e7 + 0.5) AS BIGINT)
       |      AS prior_q
       |  FROM prior p LEFT JOIN tot t USING (label)),
       |mq AS MATERIALIZED (SELECT cb.b, cb.label,
       |    CAST(floor(ln((cb.c + $alpha) / (t.tot + $ab)) * 1e7 + 0.5)
       |      AS BIGINT)
       |      - (SELECT q0 FROM lab l WHERE l.label = cb.label) AS dq
       |  FROM cb JOIN tot t USING (label)),
       |dtok AS (SELECT doc_id,
       |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                       x -> x <> '')) AS tok
       |  FROM te),
       |dh AS (SELECT doc_id, ${fnv1a64("tok")} AS h FROM dtok),
       |dt AS MATERIALIZED (SELECT doc_id, $pm AS b,
       |    CAST(count(*) AS BIGINT) AS k
       |  FROM dh GROUP BY 1, 2),
       |delta AS (SELECT dt.doc_id, mq.label,
       |    CAST(sum(dt.k * mq.dq) AS BIGINT) AS dsum
       |  FROM dt JOIN mq USING (b) GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS t
       |  FROM dt GROUP BY 1),
       |scored AS (SELECT d.doc_id, l.label,
       |    l.prior_q + coalesce(s.t, 0) * l.q0 + coalesce(x.dsum, 0)
       |      AS score
       |  FROM te d CROSS JOIN lab l
       |  LEFT JOIN sizes s ON s.doc_id = d.doc_id
       |  LEFT JOIN delta x ON x.doc_id = d.doc_id AND x.label = l.label),
       |pred AS (SELECT doc_id, label AS pred_label FROM (
       |    SELECT doc_id, label, row_number() OVER (
       |        PARTITION BY doc_id ORDER BY score DESC, label) AS rn
       |    FROM scored) WHERE rn = 1)
       |SELECT te.lang AS true_label, p.pred_label,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM te JOIN pred p USING (doc_id)
       |GROUP BY 1, 2""".stripMargin
  }

  def lmSql(buckets: Int, alpha: Double, targetPred: String): String = {
    val ab = alpha * buckets
    val pm = s"""((CASE WHEN h >= 9223372036854775808::UBIGINT
       |           THEN h::HUGEINT - $M64 ELSE h::HUGEINT END
       |      % $buckets::HUGEINT)
       |     + $buckets::HUGEINT) % $buckets::HUGEINT""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, ($targetPred) AS is_target,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> x <> '') AS ts
       |  FROM documents),
       |tfeats AS (
       |  SELECT unnest(list_transform(ts, x -> 'u:' || x)) AS feat
       |  FROM toks WHERE is_target
       |  UNION ALL
       |  SELECT 'b:' || ts[i] || ' ' || ts[i+1] AS feat
       |  FROM toks, unnest(generate_series(1, len(ts)-1)) AS t(i)
       |  WHERE is_target AND len(ts) >= 2),
       |fh AS (SELECT ${fnv1a64("feat")} AS h FROM tfeats),
       |cb AS (SELECT $pm AS b, CAST(count(*) AS BIGINT) AS c
       |  FROM fh GROUP BY 1),
       |trans AS (
       |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
       |  FROM toks, unnest(generate_series(1, len(ts)-1)) AS t(i)
       |  WHERE len(ts) >= 2),
       |tb2 AS (SELECT doc_id, w1, w2, ${fnv1a64("('b:' || w1 || ' ' || w2)")} AS h FROM trans),
       |tb2b AS (SELECT doc_id, w1, $pm AS b2 FROM tb2),
       |tb1 AS (SELECT doc_id, b2, ${fnv1a64("('u:' || w1)")} AS h FROM tb2b),
       |tb AS (SELECT doc_id, b2, $pm AS b1 FROM tb1),
       |sc AS (SELECT doc_id,
       |    CAST(floor(ln((CAST(coalesce(c2.c, 0) AS DOUBLE) + $alpha)
       |      / (CAST(coalesce(c1.c, 0) AS DOUBLE) + $ab)) * 1e7 + 0.5)
       |      AS BIGINT) AS q
       |  FROM tb LEFT JOIN cb c2 ON c2.b = tb.b2
       |          LEFT JOIN cb c1 ON c1.b = tb.b1),
       |agg AS (SELECT doc_id, CAST(sum(q) AS BIGINT) AS lm_q,
       |    CAST(count(*) AS INTEGER) AS n_transitions
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.lm_q, 0) AS lm_q,
       |       coalesce(a.n_transitions, 0) AS n_transitions
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** Full oracle for [[graft.operators.TextOps.winnowingFingerprints]]
    * (q69): replays the normalized k-gram fnv hashes (converted to SIGNED
    * to match Spark's long ordering), then packs (h + 2^63, 2^32-1-i) into
    * one HUGEINT so a plain windowed min() reproduces the
    * min-hash-rightmost-tie selection, guarded to full window starts
    * (ROWS CURRENT..w-1 FOLLOWING truncates at the end exactly like
    * Spark's slice()). */
  private def winnowingCtes(k: Int, w: Int): String =
    s"""norm AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |g0 AS (
       |  SELECT doc_id, s.i, len(t) - $k + 1 AS hn,
       |    ${fnv1a64(s"substr(t, s.i, $k)")} AS hu
       |  FROM norm, unnest(generate_series(1, len(t) - $k + 1)) AS s(i)
       |  WHERE len(t) >= $k),
       |g AS (
       |  SELECT doc_id, i, hn,
       |    (CASE WHEN hu >= 9223372036854775808::UBIGINT
       |          THEN (hu::HUGEINT - $M64)::BIGINT
       |          ELSE hu::BIGINT END) AS h
       |  FROM g0),
       |keyed AS (
       |  SELECT doc_id, i, hn,
       |    (h::HUGEINT + 9223372036854775808::HUGEINT) * 4294967296::HUGEINT
       |      + (4294967295 - i)::HUGEINT AS key
       |  FROM g),
       |m AS (
       |  SELECT doc_id, i, hn,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mk
       |  FROM keyed),
       |sel AS (
       |  SELECT DISTINCT doc_id,
       |    CAST(4294967295 - (mk % 4294967296::HUGEINT) AS BIGINT) AS pos,
       |    CAST((mk // 4294967296::HUGEINT)
       |      - 9223372036854775808::HUGEINT AS BIGINT) AS fp
       |  FROM m WHERE i <= greatest(hn - $w + 1, 1))""".stripMargin

  def winnowingSql(k: Int, w: Int): String =
    s"""WITH ${winnowingCtes(k, w)}
       |SELECT doc_id, pos, fp FROM sel""".stripMargin

  /** Full oracle for [[graft.operators.TextOps.winnowingNearDuplicates]]
    * (q70): distinct per-doc fingerprint values, doc-frequency
    * suppression, pair join, shared count >= minShared. */
  def winnowingNearDupSql(
      k: Int, w: Int, minShared: Int, maxDocFreq: Int): String = {
    val dfFilter =
      if (maxDocFreq <= 0) "dfp"
      else s"""(SELECT dfp.* FROM dfp JOIN (
         |    SELECT fp FROM dfp GROUP BY fp
         |    HAVING count(*) <= $maxDocFreq) ok USING (fp))""".stripMargin
    s"""WITH ${winnowingCtes(k, w)},
       |dfp AS (SELECT DISTINCT doc_id, fp FROM sel),
       |kept AS (SELECT * FROM $dfFilter),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b, n_shared FROM pairs
       |WHERE n_shared >= $minShared""".stripMargin
  }

  def simhashNearDupSql(maxDist: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),'\\s+'), x -> x <> '')) AS tok
       |  FROM documents),
       |th AS (SELECT doc_id, ${fnv1a64("tok")} AS h FROM toks),
       |bits AS (
       |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS v
       |  FROM th, unnest(generate_series(0,63)) AS t(b)
       |  GROUP BY doc_id, b),
       |sigs AS (
       |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::UBIGINT << b)::HUGEINT ELSE 0::HUGEINT END) AS sigh
       |  FROM bits GROUP BY doc_id),
       |allsigs AS (
       |  SELECT d.doc_id, coalesce(s.sigh, 0::HUGEINT)::UBIGINT AS sig
       |  FROM documents d LEFT JOIN sigs s USING (doc_id)),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         bit_count(xor(a.sig, b.sig)) AS hamming
       |  FROM allsigs a JOIN allsigs b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM pairs
       |WHERE hamming <= $maxDist""".stripMargin

  /** Full oracle for [[graft.operators.ClusteringOps]] k-means (q77):
    * replays the fixed-point pipeline exactly — component quantization
    * `floor(x*scale + 0.5)` to BIGINT, the splitmix64-of-id init sample
    * (signed order, ties by id — same chain as [[centroidSampleCtes]]),
    * then `iters` unrolled Lloyd rounds (squared-L2 argmin with ties to
    * the lowest ci via `qq - 2qc + cc` on DOUBLE-cast integer lists —
    * every product ≤ 2^46 so DOUBLE is exact — and per-dimension
    * `floor(sum/count)` centroid means, empty clusters carrying forward),
    * and a final assignment against the fitted centroids. */
  def kmeansSql(k: Int, iters: Int, dim: Int, scale: Long): String = {
    def assignCtes(i: Int, prev: String, sName: String, aName: String) =
      s"""$sName AS (
         |  SELECT t.vec_id, c.ci,
         |    t.qq - 2 * list_inner_product(t.qvd,
         |          list_transform(c.cv, x -> CAST(x AS DOUBLE)))
         |        + list_inner_product(
         |          list_transform(c.cv, x -> CAST(x AS DOUBLE)),
         |          list_transform(c.cv, x -> CAST(x AS DOUBLE))) AS dist
         |  FROM qx t CROSS JOIN $prev c),
         |$aName AS (
         |  SELECT vec_id, ci AS cid FROM (
         |    SELECT vec_id, ci, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist ASC, ci ASC) AS rn
         |    FROM $sName)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assignCtes(i, s"c${i - 1}", s"s$i", s"a$i")},
         |u$i AS (
         |  SELECT a.cid, t.d,
         |    CAST(floor(CAST(sum(q.qv[t.d + 1]) AS DOUBLE) / count(*)) AS BIGINT) AS v
         |  FROM a$i a JOIN q USING (vec_id) CROSS JOIN range($dim) t(d)
         |  GROUP BY a.cid, t.d),
         |c$i AS (
         |  SELECT cid AS ci, list(v ORDER BY d) AS cv FROM u$i GROUP BY cid
         |  UNION ALL
         |  SELECT ci, cv FROM c${i - 1}
         |  WHERE ci NOT IN (SELECT DISTINCT cid FROM a$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * $scale + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |qx AS (
       |  SELECT vec_id, qv, qvd, list_inner_product(qvd, qvd) AS qq FROM (
       |    SELECT vec_id, qv,
       |      list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd FROM q)),
       |h0 AS (SELECT vec_id, (vec_id::HUGEINT + $Golden::HUGEINT) % $M64 AS x FROM q),
       |h1 AS (SELECT vec_id, xor(x::UBIGINT, x::UBIGINT>>30)::HUGEINT AS a FROM h0),
       |h2 AS (SELECT vec_id, ${mulmod("a", Mix1)} AS x FROM h1),
       |h3 AS (SELECT vec_id, xor(x, x>>27)::HUGEINT AS a FROM h2),
       |h4 AS (SELECT vec_id, ${mulmod("a", Mix2)} AS x FROM h3),
       |hs AS (SELECT vec_id,
       |    CASE WHEN xor(x, x>>31) >= 9223372036854775808::UBIGINT
       |         THEN (xor(x, x>>31)::HUGEINT - $M64)::BIGINT
       |         ELSE xor(x, x>>31)::BIGINT END AS h FROM h4),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS ci, qv AS cv
       |  FROM hs JOIN q USING (vec_id)
       |  QUALIFY row_number() OVER (ORDER BY h, vec_id) <= $k),
       |$rounds,
       |${assignCtes(iters + 1, s"c$iters", "sF", "aF")}
       |SELECT vec_id, CAST(cid AS BIGINT) AS cid FROM aF""".stripMargin
  }
}
