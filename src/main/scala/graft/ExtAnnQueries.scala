package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Chat, Curation, Dedup, Graph, Multimodal, Packing, Sampling, Similarity, TextAnalysis, Unigram, WordPiece}

import ExtShared._

/** Vector family: embeddings, ANN (IVF/PQ/LSH/binary), retrieval
  * fusion and hard-negative mining.
  * Entries and oracles moved verbatim from ExtQueries (round-19
  * split); [[ExtShared]] holds the dialect bridge. */
object ExtAnnQueries {

  val queries: Map[String, Q] = Map(

    "vbf" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10)),

    "vpq" -> ((s, d) =>
      Similarity.annPq(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10, m = 8, subDim = 8, centroidStride = 50)),

    // probes the stored code index; same codebook, encoding rule, and
    // parameters as vpq → identical results, oracle is its verbatim
    "vpx" -> ((s, d) =>
      Similarity.annPqIndexed(s, pqIndexFor(s, d), Tables.embeddings(s, d),
          "vec_id", "embedding", queryId = 0L, k = 10)
        .select(col("vid").as("vec_id"), col("pq_dist"))),

    // IVF-PQ: coarse cells (ann_ivf's assignment) + product-quantized
    // residual codes (vpq's encoding) probed from the stored index —
    // the partition-pruned compressed-codes serving shape
    "vq" -> ((s, d) =>
      Similarity.annIvfPqIndexed(s, ivfPqIndexFor(s, d),
          Tables.embeddings(s, d), "vec_id", "embedding", queryId = 0L,
          k = 10, nprobe = 2)
        .select(col("vid").as("vec_id"), col("pq_dist"))),

    // queryId 32 has band-bucket partners at BOTH sf0.001 and sf0.01
    // (checked against the DuckDB bucket table) — with queryId 0 the
    // candidate set was empty at sf0.01 and the oracle row was vacuous
    // (0 rows == 0 rows proves nothing about the banding chain).
    // 8 planes per band, not the 16 the other LSH rows use: at 16 the
    // declared row matched on a SINGLE candidate (2^16 buckets over ≤5k
    // vectors — collisions vanish), so the compare exercised almost none
    // of the banding chain; at 8 the candidate set is 30/16 vectors at
    // sf0.001/sf0.01 and the row verifies a full scored top-10 page.
    "vl" -> ((s, d) =>
      Similarity.annLsh(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 32L, k = 10, bands = 8, planes = 8)),

    // recall@k of both ANN paths against the exact top-k, over a FIVE
    // query sample in one batch pass (Similarity.recallAtK — the
    // per-query loop formulation would re-scan the corpus per query).
    // Deterministic by construction: every piece is oracle-portable
    // integer math, zero-candidate queries emit explicit hits=0 rows.
    // planes = 8 matches ann_lsh's tuned banding: at 2^16 buckets over
    // this corpus LSH candidate sets are empty and every lsh row would
    // be a true-but-vacuous hits=0.
    "vr" -> ((s, d) =>
      Similarity.recallAtK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryIds = Seq(0L, 32L, 100L, 250L, 400L), k = 10, planes = 8)),

    "vv" -> ((s, d) =>
      Similarity.annIvf(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10, centroidStride = 100, nprobe = 2)),

    // BATCH indexed probe: a 10-query frame (vec_id % 50 == 10) against
    // the stored cell index in ONE job — per-query nprobe cells, union
    // of cells as a single pruned scan, per-query fused top-5.
    "vbq" -> ((s, d) =>
      Similarity.annIvfIndexedBatch(
          Tables.embeddings(s, d).where(col("vec_id") % 50 === 10),
          "vec_id", "embedding", ivfIndexFor(s, d), k = 5, nprobe = 2)
        .orderBy("query_id", "rank")),

    // The scale-safe IVF formulation: probe the PRECOMPUTED cell index
    // (partition-pruned scan of nprobe cell directories) instead of
    // re-assigning the whole corpus per query as ann_ivf does. Same
    // assignment rule, same parameters → identical results, and the
    // oracle is ann_ivf's verbatim.
    "vix" -> ((s, d) =>
      Similarity.annIvfIndexed(s, ivfIndexFor(s, d), queryId = 0L, k = 10,
          nprobe = 2)
        .select(col("vid").as("vec_id"), col("cosine"))),

    // FILTERED ANN — the deployment query ("nearest neighbors among
    // docs where label = 3"): probes the attribute-carrying cell index
    // with the predicate pushed INSIDE the cid-pruned scan, top-k still
    // fused. Label 3 keeps ~20 candidates in query 0's two probed cells
    // at both SFs, so the row verifies a real constrained ranking.
    "vf" -> ((s, d) =>
      Similarity.annIvfIndexed(s, ivfLabelIndexFor(s, d), queryId = 0L,
          k = 10, nprobe = 2,
          predicate = Some(col("label") === 3),
          attrFields = Seq(org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.IntegerType)))
        .select(col("vid").as("vec_id"), col("cosine"))),

    // Lloyd-refined IVF codebook: one assign+mean round, then the final
    // assignment against the learned centroids (stride-50 seeds -> 10
    // cells over the 500-vector corpus; every vector gets a cell, so
    // the row checks the full assignment, not a sample). The oracle
    // unrolls the identical round in SQL.
    "vkm" -> ((s, d) =>
      Similarity.kmeansRefine(Tables.embeddings(s, d), "vec_id",
          "embedding", centroidStride = 50, iters = 1)
        .select(col("vid").as("vec_id"), col("cid"))
        .orderBy("vec_id")),

    "vnr" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 20)),

    // Embedding hygiene: the validation pass before any index build —
    // width/zero/nonfinite checks plus the exact quantized norm.
    "vc" -> ((s, d) =>
      Similarity.embeddingCheck(Tables.embeddings(s, d),
          col("embedding"), col("vec_id"), expectedDims = 64)
        .orderBy("vec_id")),

    "vkg" -> ((s, d) =>
      Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 3).orderBy("src", "rn")),

    // Hard-negative mining (the retrieval-training seam): positives =
    // ranks {1, 3} of each query's plain exact ranking — a
    // NON-CONTIGUOUS set, so the anti-join must both drop interior
    // rows and let rank 2 survive into the mined output; the oracle
    // re-derives the same ranking, drops rn IN (1, 3), and re-ranks.
    "hng" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") % 50 === 10)
      val nopos = s.range(0)
        .select(col("id").as("q_id"), col("id").as("vec_id"))
      val plain = Similarity.hardNegatives(
        emb, queries, "vec_id", "embedding", nopos, k = 3)
      val pos = plain.where(col("rnk").isin(1L, 3L))
        .select("q_id", "vec_id")
      Similarity.hardNegatives(
          emb, queries, "vec_id", "embedding", pos, k = 5)
        .orderBy("q_id", "rnk")
    }),

    // SEMANTIC decontamination: eval split = vec_id % 200 == 0 (the
    // benchmark-sized sliver), train = the rest; flag train vectors
    // whose max cosine against ANY eval vector clears 0.3 (the fixture
    // embeddings' contaminated tail — ~2% of rows at both test SFs).
    // INT8 symmetric per-vector quantization over the embeddings table:
    // scale, position-weighted code fingerprint, saturation census, and
    // total reconstruction error — all on the shared 1e-6 integer grid.
    "vq8" -> ((s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d), col("vec_id"),
          col("embedding"))
        .orderBy("vec_id")),

    // 1-bit binary-quantized retrieval: sign-binarize the corpus, then
    // Hamming top-3 for the probe slice (vec_id % 100 == 0) against the
    // rest — the 32x-compressed coarse-ranking tier below vq8.
    "vb1" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hammingTopK(emb.where(col("vec_id") % 100 =!= 0),
          emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 3)
        .orderBy("q_id", "rnk")
    }),

    // Per-label centroid drift between the even and odd vec_id halves
    // (two "batches" of the same corpus) — the embedding-pipeline
    // monitoring row; integer-mean centroids, round-6 cosine.
    "vdf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.centroidDrift(emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1), "label", "embedding")
        .orderBy("label")
    }),

    // Two-stage binary serving: coarse Hamming top-20 shortlist, exact
    // quantized-cosine rerank to top-3 — the pattern that makes 1-bit
    // codes usable (code-scan recall, exact-arithmetic precision).
    "hmr" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hammingRerank(emb.where(col("vec_id") % 100 =!= 0),
          emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
          coarseK = 20, k = 3)
        .orderBy("q_id", "rnk")
    }),

    // Incremental near-dup tag against the STORED binary-code history
    // (vb1's incremental seat): fresh batch = vec_id % 10 >= 8,
    // history codes = the rest, suspect radius 20 sign-bit flips.
    "hmx" -> ((s, d) =>
      Similarity.tagNearB1Codes(
          Tables.embeddings(s, d).where(col("vec_id") % 10 >= 8),
          "vec_id", "embedding", b1CodesFor(s, d), maxHam = 20)
        .select("vec_id", "near_history").orderBy("vec_id")),

    // Binary-tier measured recall (vr's convention for the 1-bit
    // stack): of the exact cosine top-10, how many survive in the
    // Hamming coarse top-20 — the design input for hamr's coarseK.
    "hrc" -> ((s, d) =>
      Similarity.binaryRecallAtK(Tables.embeddings(s, d), "vec_id",
        "embedding", queryIds = Seq(0L, 32L, 100L, 250L, 400L),
        k = 10, coarseK = 20)),

    // BATCH INDEXED probe of the stored 1-bit code history — the vbq
    // analog for the binary stack (store = the vec_id % 10 < 8 codes
    // the hamx history holds, probe frame = the % 100 == 0 slice,
    // fused per-query Hamming top-3 in one job). A probe vector that
    // is itself stored self-matches at distance 0 — mirrored verbatim
    // in the oracle.
    "hmq" -> ((s, d) =>
      Similarity.hammingTopKIndexed(s, b1CodesFor(s, d),
          Tables.embeddings(s, d).where(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 3)
        .orderBy("q_id", "rnk")),

    // HYBRID RETRIEVAL FUSION: the bm25 lexical run and the indexed
    // ANN dense run for the SAME four-query batch, fused by
    // reciprocal rank (1e6 div (60+rank), integer-exact). The dense
    // queries are embeddings 10/60/110/160 mapped to q_id 0..3 (the
    // vbq probe's query family), dense doc space = vec_id — the
    // standard hybrid serving shape where both runs are k-sized.
    "rrf" -> ((s, d) => {
      val lex = TextAnalysis.bm25TopK(Tables.documents(s, d), col("text"),
        col("doc_id"),
        Seq(0L -> "spark window join", 1L -> "hash table scan",
          2L -> "stream batch merge", 3L -> "vector query filter"),
        k = 10)
      val dense = Similarity.annIvfIndexedBatch(
          Tables.embeddings(s, d)
            .where(col("vec_id").isin(10L, 60L, 110L, 160L)),
          "vec_id", "embedding", ivfIndexFor(s, d), k = 5, nprobe = 2)
        .select(expr("(query_id - 10) div 50").as("q_id"),
          col("vid").as("doc_id"), col("rank").as("rnk"))
      TextAnalysis.rrfFuse(
          Seq(lex.select("q_id", "doc_id", "rnk"), dense), k = 10)
        .orderBy("q_id", "rnk")
    }),

    // Matryoshka truncation recall: 16-dim-prefix cosine top-5 vs the
    // full 64-dim top-5 for the probe slice (vec_id % 100 == 0) — the
    // serve-short-prefix evaluation, in parts-per-thousand.
    "mrl" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.matryoshkaRecall(emb.where(col("vec_id") % 100 =!= 0),
          emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
          prefixDim = 16, k = 5)
        .orderBy("q_id")
    }),

    // MMR diverse top-5 for probe vec 0 over its relevance-top-20 pool
    // (lambda = 0.70): greedy argmax of 70*rel_micro - 30*maxsim_micro,
    // engine-exact integer scores.
    "mmr" -> ((s, d) =>
      Similarity.mmrSelect(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0L, poolSize = 20, k = 5, lambdaPct = 70)
        .orderBy("step")),
  )

  val oracles: Map[String, String] = Map(

    "vpq" -> AnnPqSql,

    // per-query and precomputed-index PQ share the build rule and
    // parameters, so the oracle is verbatim (the ann_ivf_idx
    // pattern)
    "vpx" -> AnnPqSql,

    "vq" -> AnnIvfPqSql,

    "vbf" -> """
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), q AS (SELECT qe AS qv FROM qz WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(
           CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qv[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM qz CROSS JOIN q WHERE vec_id <> 0
)
SELECT vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC LIMIT 10""",

    "vl" -> (rhpBucketsCte(8, 8) + """, qb AS (
  SELECT b, bucket FROM buckets WHERE vec_id = 32
), cand AS (
  SELECT DISTINCT buckets.vec_id
  FROM buckets JOIN qb ON buckets.b = qb.b AND buckets.bucket = qb.bucket
  WHERE buckets.vec_id <> 32
), q AS (SELECT qe AS qv FROM qz WHERE vec_id = 32),
scored AS (
  SELECT qz.vec_id,
         round(
           CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qv[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM qz JOIN cand ON qz.vec_id = cand.vec_id CROSS JOIN q
)
SELECT vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC LIMIT 10"""),

    // Batched mirror of Similarity.recallAtK over the five-query
    // sample: one pairs CTE scores every (query, corpus) pair, each
    // method takes its per-query windowed top-10, and the explicit
    // (method x query) base emits hits=0 rows for empty candidate sets.
    "vr" -> (rhpBucketsCte(8, 8) + """, qset AS (
  SELECT vec_id AS qid, qe AS qv FROM qz WHERE vec_id IN (0, 32, 100, 250, 400)
), pairs AS (
  SELECT q.qid, z.vec_id,
         round(
           CAST(list_sum(list_transform(range(64), i -> z.qe[i+1] * q.qv[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> z.qe[i+1] * z.qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> q.qv[i+1] * q.qv[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM qz z CROSS JOIN qset q WHERE z.vec_id <> q.qid
), bf AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
    FROM pairs)
  WHERE rn <= 10
), qb AS (
  SELECT vec_id AS qid, b, bucket FROM buckets
  WHERE vec_id IN (0, 32, 100, 250, 400)
), lcand AS (
  SELECT DISTINCT qb.qid, buckets.vec_id
  FROM buckets JOIN qb ON buckets.b = qb.b AND buckets.bucket = qb.bucket
  WHERE buckets.vec_id <> qb.qid
), lshtop AS (
  SELECT qid, vec_id FROM (
    SELECT p.qid, p.vec_id,
           row_number() OVER (PARTITION BY p.qid ORDER BY p.cosine DESC, p.vec_id ASC) AS rn
    FROM pairs p JOIN lcand ON p.qid = lcand.qid AND p.vec_id = lcand.vec_id)
  WHERE rn <= 10
), cents AS (
  SELECT vec_id AS cid, qe AS ce FROM qz WHERE vec_id % 100 = 0
), cscored AS (
  SELECT qz.vec_id, cents.cid,
         round(
           CAST(list_sum(list_transform(range(64), i -> qe[i+1] * ce[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> ce[i+1] * ce[i+1])) AS DOUBLE)),
           6) AS ccos
  FROM qz CROSS JOIN cents
), cranked AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rnk
  FROM cscored
), cells AS (SELECT vec_id, cid FROM cranked WHERE rnk = 1),
qcells AS (
  SELECT vec_id AS qid, cid FROM cranked
  WHERE vec_id IN (0, 32, 100, 250, 400) AND rnk <= 2
), ivftop AS (
  SELECT qid, vec_id FROM (
    SELECT p.qid, p.vec_id,
           row_number() OVER (PARTITION BY p.qid ORDER BY p.cosine DESC, p.vec_id ASC) AS rn
    FROM pairs p
    JOIN cells c ON p.vec_id = c.vec_id
    JOIN qcells qc ON p.qid = qc.qid AND c.cid = qc.cid)
  WHERE rn <= 10
), base AS (
  SELECT m.method, q.qid
  FROM (SELECT 'ivf' AS method UNION ALL SELECT 'lsh') m
  CROSS JOIN (SELECT unnest([0, 32, 100, 250, 400]) AS qid) q
), hits AS (
  SELECT 'ivf' AS method, t.qid, count(*) AS h
  FROM ivftop t JOIN bf ON t.qid = bf.qid AND t.vec_id = bf.vec_id GROUP BY 2
  UNION ALL
  SELECT 'lsh', t.qid, count(*)
  FROM lshtop t JOIN bf ON t.qid = bf.qid AND t.vec_id = bf.vec_id GROUP BY 2
)
SELECT base.method, CAST(base.qid AS BIGINT) AS query_id,
       CAST(coalesce(h, 0) AS BIGINT) AS hits, 10 AS k
FROM base LEFT JOIN hits ON base.method = hits.method AND base.qid = hits.qid
ORDER BY 1, 2"""),

    "vv" -> AnnIvfSql,
    "vbq" -> AnnBatchSql,

    // identical by construction: the index stores the same assignment
    // the per-query formulation computes (ExtQueries.ivfIndexFor)
    "vix" -> AnnIvfSql,

    // the same IVF unroll constrained to label-3 candidates — the
    // filter applies to CANDIDATES only, never to cell assignment or
    // the query's probed cells, mirroring the Spark plan exactly
    "vf" -> annIvfSqlWhere(
      " AND qz.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)"),

    // kmeansRefine with iters=1 unrolled: seed codebook -> assignment
    // a1 -> per-(cell, dim) integer means (the sign trick mirrors
    // Spark's truncating `div`; DuckDB's // floors) -> final assignment.
    "vkm" -> ("""WITH qz AS (
  SELECT vec_id AS vid,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), c0 AS (
  SELECT vid AS cid, qe AS ce FROM qz WHERE vid % 50 = 0
), a1 AS (
  SELECT vid, cid FROM (
    SELECT qz.vid, c0.cid,
           row_number() OVER (PARTITION BY qz.vid ORDER BY
             round(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * ce[i+1])) AS DOUBLE)
               / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                      * CAST(list_sum(list_transform(range(64), i -> ce[i+1] * ce[i+1])) AS DOUBLE)),
               6) DESC, c0.cid ASC) AS rnk
    FROM qz CROSS JOIN c0)
  WHERE rnk = 1
), s1 AS (
  SELECT a1.cid, d.i AS d, sum(qe[d.i+1]) AS s, count(*) AS n
  FROM a1 JOIN qz ON a1.vid = qz.vid
  CROSS JOIN (SELECT unnest(range(64)) AS i) d
  GROUP BY 1, 2
), c1 AS (
  SELECT cid,
         list(CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END ORDER BY d) AS ce
  FROM s1 GROUP BY 1
)
SELECT vid AS vec_id, cid FROM (
  SELECT qz.vid, c1.cid,
         row_number() OVER (PARTITION BY qz.vid ORDER BY
           round(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * ce[i+1])) AS DOUBLE)
             / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                    * CAST(list_sum(list_transform(range(64), i -> ce[i+1] * ce[i+1])) AS DOUBLE)),
             6) DESC, c1.cid ASC) AS rnk
  FROM qz CROSS JOIN c1)
WHERE rnk = 1 ORDER BY vec_id"""),

    "vkg" -> (rhpBucketsCte(8, 16) + """, cand AS (
  SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst
  FROM buckets x JOIN buckets y
    ON x.b = y.b AND x.bucket = y.bucket AND x.vec_id <> y.vec_id
), scored AS (
  SELECT src, dst,
         round(
           CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * a.qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> b.qe[i+1] * b.qe[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM cand JOIN qz a ON src = a.vec_id JOIN qz b ON dst = b.vec_id
)
SELECT src, dst, cosine, CAST(rn AS INT) AS rn FROM (
  SELECT src, dst, cosine,
         row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rn
  FROM scored)
WHERE rn <= 3 ORDER BY src, rn"""),

    // outlier components (|x| > 10, the n_outlier signal) zero out of
    // the norm exactly as in Similarity.embeddingCheck — the exact-norm
    // contract only covers inlier magnitudes (ADVICE r13 overflow fix)
    "vc" -> ("""WITH q AS (
  SELECT vec_id, embedding,
    list_transform(embedding, x -> CAST(round(
      CASE WHEN x IS NULL OR isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE))
           OR abs(CAST(x AS DOUBLE)) > 10.0
           THEN 0 ELSE CAST(x AS DOUBLE) END * 1e6) AS BIGINT)) AS qe
  FROM embeddings
)
SELECT vec_id,
  CAST(len(embedding) AS INT) AS n_dims,
  (len(embedding) = 64) AS dims_ok,
  CAST(len(list_filter(embedding, x -> x IS NULL OR isnan(CAST(x AS DOUBLE))
    OR isinf(CAST(x AS DOUBLE)))) AS INT) AS n_nonfinite,
  CAST(len(list_filter(embedding, x -> x IS NOT NULL
    AND NOT isnan(CAST(x AS DOUBLE)) AND NOT isinf(CAST(x AS DOUBLE))
    AND abs(CAST(x AS DOUBLE)) > 10.0)) AS INT) AS n_outlier,
  CAST(len(list_filter(qe, v -> v = 0)) AS INT) AS n_zero,
  (len(list_filter(qe, v -> v <> 0)) = 0) AS is_zero,
  CAST(list_sum(list_transform(qe, v -> v * v)) AS BIGINT) AS norm2_q
FROM q ORDER BY vec_id"""),

    "vnr" -> (rhpBucketsCte(8, 16) + """, cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM buckets x JOIN buckets y
    ON x.b = y.b AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT id_a, id_b,
       round(
         CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * a.qe[i+1])) AS DOUBLE)
                * CAST(list_sum(list_transform(range(64), i -> b.qe[i+1] * b.qe[i+1])) AS DOUBLE)),
         6) AS cosine
FROM cand JOIN qz a ON id_a = a.vec_id JOIN qz b ON id_b = b.vec_id
ORDER BY cosine DESC, id_a ASC, id_b ASC LIMIT 20"""),

    // Mirror of hardNegatives: the full exact ranking per query
    // (quantized cosine, vec_id tie-break), positives = rn IN (1, 3),
    // negatives re-ranked over the remainder and cut at 5.
    "hng" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), qs AS (SELECT vec_id AS qid, qe AS qv FROM qz WHERE vec_id % 50 = 10),
sc AS (
  SELECT qs.qid, qz.vec_id,
         round(
           CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qv[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM qz CROSS JOIN qs WHERE qz.vec_id <> qs.qid
), rk AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid
           ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM sc
), neg AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid
           ORDER BY cosine DESC, vec_id ASC) AS rnk
  FROM rk WHERE rn NOT IN (1, 3)
)
SELECT qid AS q_id, CAST(rnk AS BIGINT) AS rnk, vec_id, cosine
FROM neg WHERE rnk <= 5 ORDER BY q_id, rnk"""),

    // Same quantized-integer cosine arithmetic as the ann_* oracles;
    // max over the eval sliver, threshold 0.3.
    // Mirror of quantizeInt8: the 1e-6 grid, round-half-up magnitudes
    // (all division operands non-negative, so DuckDB's floor // equals
    // Spark's truncating div), sign reapplied outside.
    "vq8" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
  FROM embeddings
), mm AS (
  SELECT vec_id, xq,
         coalesce(list_max(list_transform(xq, x -> abs(x))), 0) AS mu
  FROM qz
), q AS (
  SELECT vec_id, mu, xq,
    list_transform(xq, x -> CASE WHEN mu = 0 THEN 0
      ELSE (CASE WHEN x < 0 THEN -1 ELSE 1 END)
           * ((abs(x) * 127 + mu // 2) // mu) END) AS q8
  FROM mm
)
SELECT vec_id, CAST(mu AS BIGINT) AS max_um,
  CAST(coalesce(list_sum(list_transform(range(len(q8)),
    i -> q8[i+1] * (i+1))), 0) AS BIGINT) AS q8_fp,
  CAST(len(list_filter(q8, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
  CAST(coalesce(list_sum(list_transform(xq, x -> CASE WHEN mu = 0 THEN 0
    ELSE abs(abs(x) - (((abs(x) * 127 + mu // 2) // mu) * mu) // 127)
    END)), 0) AS BIGINT) AS err_um
FROM q ORDER BY vec_id"""),

    // Mirror of Similarity.binarize1Bit + hammingTopK: sign bits on the
    // 1e-6 grid packed little-endian into two non-negative 32-bit
    // halves, probe slice vec_id % 100 = 0 vs the rest, Hamming top-3
    // per probe with vec_id tie-break.
    "vb1" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
  FROM embeddings
), bits AS (
  SELECT vec_id,
    CAST(coalesce(list_sum(list_transform(range(32, 64),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << (i - 32)
           ELSE 0 END)), 0) AS BIGINT) AS b_hi,
    CAST(coalesce(list_sum(list_transform(range(32),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << i
           ELSE 0 END)), 0) AS BIGINT) AS b_lo
  FROM qz
), pr AS (
  SELECT vec_id AS q_id, b_hi AS qhi, b_lo AS qlo
  FROM bits WHERE vec_id % 100 = 0
), hm AS (
  SELECT pr.q_id, tr.vec_id,
         CAST(bit_count(xor(tr.b_hi, pr.qhi))
            + bit_count(xor(tr.b_lo, pr.qlo)) AS BIGINT) AS ham
  FROM (SELECT * FROM bits WHERE vec_id % 100 <> 0) tr
  CROSS JOIN pr
)
SELECT q_id, rnk, vec_id, ham FROM (
  SELECT q_id, vec_id, ham,
         row_number() OVER (PARTITION BY q_id ORDER BY ham, vec_id) AS rnk
  FROM hm)
WHERE rnk <= 3 ORDER BY q_id, rnk"""),

    // Mirror of Similarity.centroidDrift over the even/odd halves:
    // per-(label, half, dim) integer sums div group count, per-label
    // dot and norms over the centroid dimensions, round-6 cosine.
    "vdf" -> ("""WITH qz AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), cnt AS (
  SELECT label, (vec_id % 2 = 0) AS ea, CAST(count(*) AS BIGINT) AS n
  FROM qz GROUP BY 1, 2
), d AS (
  SELECT label, (vec_id % 2 = 0) AS ea, i, qe[i+1] AS v
  FROM (SELECT vec_id, label, qe, unnest(range(64)) AS i FROM qz)
), c AS (
  SELECT d.label, d.ea, d.i, CAST(sum(d.v) AS BIGINT) // cnt.n AS c
  FROM d JOIN cnt ON cnt.label = d.label AND cnt.ea = d.ea
  GROUP BY d.label, d.ea, d.i, cnt.n
), j AS (
  SELECT a.label, a.i, a.c AS ca, b.c AS cb
  FROM (SELECT * FROM c WHERE ea) a
  JOIN (SELECT * FROM c WHERE NOT ea) b
    ON a.label = b.label AND a.i = b.i
), s AS (
  SELECT label, sum(ca*cb) AS dot, sum(ca*ca) AS n2a, sum(cb*cb) AS n2b
  FROM j GROUP BY 1
)
SELECT s.label, na.n AS n_a, nb.n AS n_b,
  CASE WHEN s.n2a = 0 OR s.n2b = 0 THEN NULL
       ELSE round(CAST(s.dot AS DOUBLE)
         / sqrt(CAST(s.n2a AS DOUBLE) * CAST(s.n2b AS DOUBLE)), 6)
       END AS cos
FROM s JOIN cnt na ON na.label = s.label AND na.ea
JOIN cnt nb ON nb.label = s.label AND NOT nb.ea
ORDER BY s.label"""),

    // Mirror of Similarity.hammingRerank: the vb1 coarse ranking
    // widened to top-20, reranked by the exact quantized cosine, cut
    // to 3 (vec_id tie-breaks at both stages).
    "hmr" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
  FROM embeddings
), v AS (
  SELECT vec_id, xq,
    list_sum(list_transform(range(64), i -> xq[i+1]*xq[i+1])) AS n2,
    CAST(coalesce(list_sum(list_transform(range(32, 64),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << (i - 32)
           ELSE 0 END)), 0) AS BIGINT) AS b_hi,
    CAST(coalesce(list_sum(list_transform(range(32),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << i
           ELSE 0 END)), 0) AS BIGINT) AS b_lo
  FROM qz
), pr AS (SELECT * FROM v WHERE vec_id % 100 = 0),
tr AS (SELECT * FROM v WHERE vec_id % 100 <> 0),
coarse AS (
  SELECT q_id, vec_id, ham FROM (
    SELECT pr.vec_id AS q_id, tr.vec_id,
           CAST(bit_count(xor(tr.b_hi, pr.b_hi))
              + bit_count(xor(tr.b_lo, pr.b_lo)) AS BIGINT) AS ham,
           row_number() OVER (PARTITION BY pr.vec_id
             ORDER BY bit_count(xor(tr.b_hi, pr.b_hi))
                    + bit_count(xor(tr.b_lo, pr.b_lo)), tr.vec_id) AS rn
    FROM tr CROSS JOIN pr)
  WHERE rn <= 20
), rr AS (
  SELECT c.q_id, c.vec_id, c.ham,
    round(CAST(list_sum(list_transform(range(64),
            i -> t.xq[i+1]*p.xq[i+1])) AS DOUBLE)
          / sqrt(CAST(t.n2 AS DOUBLE) * CAST(p.n2 AS DOUBLE)), 6) AS cosine
  FROM coarse c
  JOIN v t ON t.vec_id = c.vec_id
  JOIN v p ON p.vec_id = c.q_id
)
SELECT q_id, rnk, vec_id, ham, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
    ORDER BY cosine DESC, vec_id) AS rnk FROM rr)
WHERE rnk <= 3 ORDER BY q_id, rnk"""),

    // Mirror of Similarity.tagNearB1Codes against the stored history
    // codes (vec_id % 10 < 8): a fresh vector tags near_history iff
    // some history code sits within 20 sign-bit flips.
    "hmx" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
  FROM embeddings
), bits AS (
  SELECT vec_id,
    CAST(coalesce(list_sum(list_transform(range(32, 64),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << (i - 32)
           ELSE 0 END)), 0) AS BIGINT) AS b_hi,
    CAST(coalesce(list_sum(list_transform(range(32),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << i
           ELSE 0 END)), 0) AS BIGINT) AS b_lo
  FROM qz
), bt AS (SELECT * FROM bits WHERE vec_id % 10 >= 8),
hs AS (SELECT * FROM bits WHERE vec_id % 10 < 8),
nr AS (
  SELECT DISTINCT bt.vec_id FROM bt JOIN hs
    ON bit_count(xor(bt.b_hi, hs.b_hi))
     + bit_count(xor(bt.b_lo, hs.b_lo)) <= 20
)
SELECT bt.vec_id, (nr.vec_id IS NOT NULL) AS near_history
FROM bt LEFT JOIN nr USING (vec_id) ORDER BY vec_id"""),

    // Mirror of Similarity.binaryRecallAtK: vb1's binarize + Hamming
    // ranking (self excluded, coarse top-20) intersected with vr's
    // exact round-6 cosine top-10 per query.
    "hrc" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), bits AS (
  SELECT vec_id,
    CAST(coalesce(list_sum(list_transform(range(32, 64),
      i -> CASE WHEN qe[i+1] > 0 THEN CAST(1 AS BIGINT) << (i - 32)
           ELSE 0 END)), 0) AS BIGINT) AS b_hi,
    CAST(coalesce(list_sum(list_transform(range(32),
      i -> CASE WHEN qe[i+1] > 0 THEN CAST(1 AS BIGINT) << i
           ELSE 0 END)), 0) AS BIGINT) AS b_lo
  FROM qz
), qset AS (
  SELECT vec_id AS qid, qe AS qv FROM qz WHERE vec_id IN (0, 32, 100, 250, 400)
), pairs AS (
  SELECT q.qid, z.vec_id,
         round(
           CAST(list_sum(list_transform(range(64), i -> z.qe[i+1] * q.qv[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> z.qe[i+1] * z.qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> q.qv[i+1] * q.qv[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM qz z CROSS JOIN qset q WHERE z.vec_id <> q.qid
), bf AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rn
    FROM pairs)
  WHERE rn <= 10
), qb AS (
  SELECT vec_id AS qid, b_hi AS qhi, b_lo AS qlo FROM bits
  WHERE vec_id IN (0, 32, 100, 250, 400)
), hm AS (
  SELECT qb.qid, bits.vec_id,
         bit_count(xor(bits.b_hi, qb.qhi))
           + bit_count(xor(bits.b_lo, qb.qlo)) AS ham
  FROM bits CROSS JOIN qb WHERE bits.vec_id <> qb.qid
), coarse AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS rn
    FROM hm)
  WHERE rn <= 20
), hits AS (
  SELECT bf.qid, count(*) AS h
  FROM bf JOIN coarse ON bf.qid = coarse.qid AND bf.vec_id = coarse.vec_id
  GROUP BY 1
)
SELECT CAST(q.qid AS BIGINT) AS query_id,
       CAST(coalesce(h, 0) AS BIGINT) AS hits,
       CAST(10 AS BIGINT) AS k, CAST(20 AS BIGINT) AS coarse_k
FROM (SELECT unnest([0, 32, 100, 250, 400]) AS qid) q
LEFT JOIN hits ON q.qid = hits.qid ORDER BY query_id"""),

    // Mirror of Similarity.hammingTopKIndexed: vb1's binarize/top-k
    // arithmetic with hamx's store/probe split — store = % 10 < 8,
    // probes = % 100 = 0 (self-matches included, distance 0).
    "hmq" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
  FROM embeddings
), bits AS (
  SELECT vec_id,
    CAST(coalesce(list_sum(list_transform(range(32, 64),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << (i - 32)
           ELSE 0 END)), 0) AS BIGINT) AS b_hi,
    CAST(coalesce(list_sum(list_transform(range(32),
      i -> CASE WHEN xq[i+1] > 0 THEN CAST(1 AS BIGINT) << i
           ELSE 0 END)), 0) AS BIGINT) AS b_lo
  FROM qz
), pr AS (
  SELECT vec_id AS q_id, b_hi AS qhi, b_lo AS qlo
  FROM bits WHERE vec_id % 100 = 0
), hm AS (
  SELECT pr.q_id, hs.vec_id,
         CAST(bit_count(xor(hs.b_hi, pr.qhi))
            + bit_count(xor(hs.b_lo, pr.qlo)) AS BIGINT) AS ham
  FROM (SELECT * FROM bits WHERE vec_id % 10 < 8) hs
  CROSS JOIN pr
)
SELECT q_id, rnk, vec_id, ham FROM (
  SELECT q_id, vec_id, ham,
         row_number() OVER (PARTITION BY q_id ORDER BY ham, vec_id) AS rnk
  FROM hm)
WHERE rnk <= 3 ORDER BY q_id, rnk"""),

    // The bm25 chain and the vbq ANN chain (qs restricted to the four
    // query embeddings) verbatim, fused by integer reciprocal rank.
    "rrf" -> ("""WITH qt AS (
  SELECT CAST(q_id AS BIGINT) AS q_id, term FROM (VALUES
    (0, 'spark'), (0, 'window'), (0, 'join'),
    (1, 'hash'), (1, 'table'), (1, 'scan'),
    (2, 'stream'), (2, 'batch'), (2, 'merge'),
    (3, 'vector'), (3, 'query'), (3, 'filter')) AS t(q_id, term)
), w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents
), d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS s_len
  FROM d
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
  WHERE term IN (SELECT term FROM qt)
  GROUP BY 1, 2
), dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT qt.q_id, tf.doc_id,
    sum( CAST(length(bin((2*st.n_docs - 2*dfq.df + 1) // (2*dfq.df + 1)))
           AS BIGINT)
       * ((2200000000 * st.s_len * tf.tf) //
          (1000 * st.s_len * tf.tf + 300 * st.s_len
           + 900 * d.dl * st.n_docs)) ) AS score
  FROM tf JOIN dfq USING (term) JOIN qt USING (term)
  JOIN d USING (doc_id) CROSS JOIN st
  GROUP BY 1, 2
), lex AS (
  SELECT q_id, doc_id, rnk FROM (
    SELECT q_id, doc_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY score DESC, doc_id) AS rnk
    FROM sc)
  WHERE rnk <= 10
), qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), cents AS (
  SELECT vec_id AS cid, qe AS ce FROM qz WHERE vec_id % 100 = 0
), scored AS (
  SELECT qz.vec_id, cents.cid,
         round(
           CAST(list_sum(list_transform(range(64), i -> qe[i+1] * ce[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> ce[i+1] * ce[i+1])) AS DOUBLE)),
           6) AS ccos
  FROM qz CROSS JOIN cents
), ranked AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rnk
  FROM scored
), cells AS (SELECT vec_id, cid FROM ranked WHERE rnk = 1),
qs AS (SELECT vec_id AS qid, qe AS qv FROM qz
       WHERE vec_id IN (10, 60, 110, 160)),
qcells AS (
  SELECT r.vec_id AS qid, r.cid FROM ranked r JOIN qs ON r.vec_id = qs.qid
  WHERE r.rnk <= 2
), cand AS (
  SELECT qs.qid, qz.vec_id,
         round(
           CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qv[i+1])) AS DOUBLE)
           / sqrt(CAST(list_sum(list_transform(range(64), i -> qe[i+1] * qe[i+1])) AS DOUBLE)
                  * CAST(list_sum(list_transform(range(64), i -> qv[i+1] * qv[i+1])) AS DOUBLE)),
           6) AS cosine
  FROM qcells
  JOIN cells ON cells.cid = qcells.cid
  JOIN qz ON qz.vec_id = cells.vec_id
  JOIN qs ON qs.qid = qcells.qid
  WHERE qz.vec_id <> qs.qid
), den AS (
  SELECT (qid - 10) // 50 AS q_id, vec_id AS doc_id, rn AS rnk FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
             ORDER BY cosine DESC, vec_id ASC) AS rn
    FROM cand)
  WHERE rn <= 5
), u AS (
  SELECT q_id, doc_id, rnk FROM lex
  UNION ALL SELECT q_id, doc_id, rnk FROM den
), f AS (
  SELECT q_id, doc_id,
         CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS score
  FROM u GROUP BY 1, 2
)
SELECT q_id, rnk, doc_id, score FROM (
  SELECT q_id, doc_id, score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM f)
WHERE rnk <= 10 ORDER BY q_id, rnk"""),

    // Mirror of Similarity.matryoshkaRecall: 16-dim-prefix cosine
    // top-5 vs full 64-dim top-5 (same rounded-double cosine, vec_id
    // tie-breaks), probe slice vec_id % 100 = 0, ppt recall.
    "mrl" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), v AS (
  SELECT vec_id, qe, qe[1:16] AS qp,
    list_sum(list_transform(range(64), i -> qe[i+1]*qe[i+1])) AS n2,
    list_sum(list_transform(range(16), i -> qe[i+1]*qe[i+1])) AS p2
  FROM qz
), pr AS (
  SELECT vec_id AS q_id, qe AS qv, qp AS pv, n2 AS qn2, p2 AS qp2
  FROM v WHERE vec_id % 100 = 0
), tr AS (SELECT * FROM v WHERE vec_id % 100 <> 0),
pairs AS (
  SELECT pr.q_id, tr.vec_id,
    round(CAST(list_sum(list_transform(range(64),
            i -> tr.qe[i+1]*pr.qv[i+1])) AS DOUBLE)
          / sqrt(CAST(tr.n2 AS DOUBLE) * CAST(pr.qn2 AS DOUBLE)), 6) AS cf,
    round(CAST(list_sum(list_transform(range(16),
            i -> tr.qp[i+1]*pr.pv[i+1])) AS DOUBLE)
          / sqrt(CAST(tr.p2 AS DOUBLE) * CAST(pr.qp2 AS DOUBLE)), 6) AS cp
  FROM tr CROSS JOIN pr
),
fullk AS (SELECT q_id, vec_id FROM (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cf DESC, vec_id) AS rn
  FROM pairs) WHERE rn <= 5),
prefk AS (SELECT q_id, vec_id FROM (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cp DESC, vec_id) AS rn
  FROM pairs) WHERE rn <= 5),
h AS (SELECT q_id, count(*) AS hits
      FROM fullk JOIN prefk USING (q_id, vec_id) GROUP BY 1)
SELECT pr.q_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(coalesce(h.hits, 0) * 1000 // 5 AS BIGINT) AS recall_pm
FROM pr LEFT JOIN h USING (q_id) ORDER BY q_id"""),

    // Mirror of Similarity.mmrSelect for probe vec 0: relevance pool =
    // top-20 by micro-cosine (HALF_UP round(cos*1e6), the engines'
    // shared rounding), then five unrolled greedy picks of
    // 70*rel - 30*max-sim-to-selected with vec_id tie-breaks.
    "mmr" -> ("""WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings
), v AS (
  SELECT vec_id, qe,
    list_sum(list_transform(range(64), i -> qe[i+1]*qe[i+1])) AS n2
  FROM qz
), q AS (SELECT qe AS qv, n2 AS qn2 FROM v WHERE vec_id = 0),
scored AS (
  SELECT v.vec_id, v.qe, v.n2,
    CAST(round(CAST(list_sum(list_transform(range(64),
           i -> v.qe[i+1]*q.qv[i+1])) AS DOUBLE)
         / sqrt(CAST(v.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) * 1e6)
      AS BIGINT) AS relq
  FROM v CROSS JOIN q WHERE v.vec_id <> 0
),
pool AS (SELECT vec_id, qe, n2, relq FROM (
  SELECT *, row_number() OVER (ORDER BY relq DESC, vec_id) AS rn
  FROM scored) WHERE rn <= 20),
pp AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
    CAST(round(CAST(list_sum(list_transform(range(64),
           i -> a.qe[i+1]*b.qe[i+1])) AS DOUBLE)
         / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) * 1e6)
      AS BIGINT) AS simq
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
s1 AS (SELECT vec_id, 70*relq AS sc FROM pool
       ORDER BY sc DESC, vec_id LIMIT 1),
s2 AS (
  SELECT p.vec_id, 70*p.relq - 30*max(pp.simq) AS sc
  FROM pool p JOIN pp ON pp.va = p.vec_id
    AND pp.vb IN (SELECT vec_id FROM s1)
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1)
  GROUP BY p.vec_id, p.relq
  ORDER BY sc DESC, p.vec_id LIMIT 1
),
s3 AS (
  SELECT p.vec_id, 70*p.relq - 30*max(pp.simq) AS sc
  FROM pool p JOIN pp ON pp.va = p.vec_id
    AND pp.vb IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
  GROUP BY p.vec_id, p.relq
  ORDER BY sc DESC, p.vec_id LIMIT 1
),
s4 AS (
  SELECT p.vec_id, 70*p.relq - 30*max(pp.simq) AS sc
  FROM pool p JOIN pp ON pp.va = p.vec_id
    AND pp.vb IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                  UNION SELECT vec_id FROM s3)
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                         UNION SELECT vec_id FROM s3)
  GROUP BY p.vec_id, p.relq
  ORDER BY sc DESC, p.vec_id LIMIT 1
),
s5 AS (
  SELECT p.vec_id, 70*p.relq - 30*max(pp.simq) AS sc
  FROM pool p JOIN pp ON pp.va = p.vec_id
    AND pp.vb IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                  UNION SELECT vec_id FROM s3 UNION SELECT vec_id FROM s4)
  WHERE p.vec_id NOT IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
                         UNION SELECT vec_id FROM s3
                         UNION SELECT vec_id FROM s4)
  GROUP BY p.vec_id, p.relq
  ORDER BY sc DESC, p.vec_id LIMIT 1
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, vec_id, CAST(sc AS BIGINT) AS mmr_score
  FROM s1
  UNION ALL SELECT 2, vec_id, CAST(sc AS BIGINT) FROM s2
  UNION ALL SELECT 3, vec_id, CAST(sc AS BIGINT) FROM s3
  UNION ALL SELECT 4, vec_id, CAST(sc AS BIGINT) FROM s4
  UNION ALL SELECT 5, vec_id, CAST(sc AS BIGINT) FROM s5
) ORDER BY step"""),
  )
}
