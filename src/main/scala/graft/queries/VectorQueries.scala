package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding
  * Array[Float], label). Cosine math is done in double with deterministic
  * left-fold accumulation and rounded to 4 decimals for cross-engine
  * comparison (graft.functions.VectorFunctions).
  */
object VectorQueries extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact top-5 cosine neighbors for query vectors
    // (vec_id < 10); query side broadcast, corpus scan stays parallel.
    "q26_ann_topk" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
    }),

    // Embedding near-dup pairs within label blocks, cosine >= 0.45.
    "q27_embedding_neardup" -> ((spark, dir) => {
      Similarity.blockedNearDups(Tables.embeddings(spark, dir),
        "vec_id", "embedding", "label", threshold = 0.45)
        .withColumnRenamed("block", "label")
    }),

    // IVF ANN: md5-picked centroids + rounded-similarity ranking make the
    // whole pipeline (centroid sample, cell assignment, probe selection,
    // final top-k) oracle-reproducible; recall vs brute force additionally
    // asserted in OperatorsSpec.
    "q60_ivf_ann" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, nlist = 16, nProbe = 4)
    }),

    // Hyperplane-LSH ANN, md5-derived planes + integer projections so the
    // bucketing is engine-neutral (the xxhash64 production path is
    // Similarity.lshTopK, recall-tested in OperatorsSpec).
    "q42_lsh_ann" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.lshTopKMd5(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, planes = 6, dim = 64)
    }),

    // Rademacher random projection (JL transform) of every embedding to
    // 8 components: md5-parity sign matrix + exact BIGINT micro-unit
    // sums, so each projected component is bit-identical cross-engine.
    // One map-only corpus pass, zero shuffle (PlanSpec-gated).
    "q95_random_projection" -> ((spark, dir) => {
      Similarity.randomProject(Tables.embeddings(spark, dir),
        "vec_id", "embedding", outDim = 8, dim = 64)
    }),

    // Compress-then-search: RP shortlist (L2 in the 8-dim projected
    // space, exact BIGINT) + exact micro-L2 rerank — the projection
    // actually driving a search, not just a transform.
    "q98_rp_rerank" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.rpRerankTopK(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, shortlist = 50, outDim = 8, dim = 64)
    }),

    // Product-quantization ANN: md5-picked codebook, integer micro-unit
    // L2 everywhere (codebook assignment, ADC tables, ranking), so the
    // compressed-index pipeline is exact BIGINT arithmetic in any
    // engine. Recall vs brute force asserted in OperatorsSpec.
    "q78_pq_ann" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.pqTopK(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, m = 16, ksub = 16, dim = 64)
    }),

    // PQ shortlist + exact integer-L2 rerank — the two-tier production
    // ANN pipeline, all-BIGINT so the oracle replays both tiers.
    "q79_pq_rerank" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.pqRerankTopK(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, shortlist = 50, m = 16, ksub = 16, dim = 64)
    }),

    // Distributed Lloyd's k-means (2 rounds, k=8, seeds = lowest ids):
    // rounded distances + rounded centroid means make every iteration
    // oracle-reproducible; the corpus never shuffles (broadcast
    // centroids + map-side argmin + one (cluster,dim)-keyed aggregate).
    "q102_kmeans" -> ((spark, dir) =>
      graft.operators.Clustering.kmeans(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 8, iters = 2)),

    // Cluster-balanced sampling off the k-means assignment: at most 10
    // docs per cluster by the deterministic md5 order — the diversity
    // step that stops a dominant cluster from flooding a training mix.
    "q103_cluster_sample" -> ((spark, dir) => {
      val a = graft.operators.Clustering.kmeans(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 8, iters = 2)
      graft.operators.Clustering.clusterBalancedSample(a, "vec_id", n = 10)
        .select(col("cluster"), col("vec_id"))
        .orderBy(col("cluster"), col("vec_id"))
    }),

    // IVF-PQ combined ANN: q60's cell probing over q78's integer ADC
    // codes — a query scores only its probed cells' 8-byte codes. The
    // full composition stays oracle-reproducible (rounded-cosine
    // probes, exact-integer ADC).
    "q124_ivfpq_ann" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.ivfPqTopK(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, nlist = 16, nProbe = 4)
    }),

    // int8 scalar quantization (FAISS-SQ8 shape) + quantized top-5:
    // per-dim min/max fitted in one model-sized-shuffle pass, codes by
    // the deterministic double-then-floor affine map, ranking by the
    // exact integer code dot product — every stage oracle-replayable.
    "q130_sq8_ann" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.sq8TopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, dim = 64)
        .orderBy(col("qid"), col("rk"))
    }),

    // q85's semantic dedup run entirely on the SQ8 CODE tier (q130's 4x
    // embedding-store compression): quantizer fit at construction,
    // blocked pair scan over exact integer decoded-micro dots, then the
    // same CC cluster resolution. The 100 TB posture where raw float
    // vectors never exist at dedup time.
    "q144_sq8_semantic_dedup" -> ((spark, dir) => {
      import spark.implicits._
      val pairs = Similarity.blockedNearDupsSq8(
          Tables.embeddings(spark, dir), "vec_id", "embedding", "label",
          threshold = 0.2, dim = 64)
        .select($"id_a", $"id_b")
      graft.operators.Clusters.connectedComponents(pairs, edgesDeduped = true)
        .select($"id".as("vec_id"), $"cluster",
          ($"id" === $"cluster").as("is_canonical"))
    }),

    // PCA's corpus-scale half, oracle-gated: the micro-unit-quantized
    // moment sums (count, per-dim sums, upper-tri co-moments) that
    // Pca.fit reduces the corpus to. Exact BIGINT arithmetic = order-
    // free = DuckDB replays it bit-identically; the d×d eigensolve
    // and projection stay spec-gated (PcaSpec, 1e-8 vs a single-node
    // reference, variance-equals-eigenvalue invariant).
    "q123_pca_gramian" -> ((spark, dir) => {
      graft.operators.Pca.gramianMicro(
        Tables.embeddings(spark, dir), "embedding", dim = 64)
        .orderBy(col("i"), col("j"))
    })
  )

  override def oracles: Map[String, String] = Map(
    // mirrors Similarity.sq8Fit/sq8Encode/sq8TopK: per-dim min/max,
    // affine byte codes (identical IEEE double ops + floor in both
    // engines), exact-integer dot-product ranking
    "q130_sq8_ann" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |idx AS (SELECT CAST(d AS INTEGER) AS d FROM range(64) t(d)),
        |st AS (SELECT d, MIN(v[d + 1]) AS mn, MAX(v[d + 1]) AS mx
        |       FROM v CROSS JOIN idx GROUP BY d),
        |codes AS (
        |  SELECT vec_id, d,
        |    CASE WHEN mx <= mn THEN 0
        |         ELSE LEAST(255, GREATEST(0,
        |           CAST(floor((v[d + 1] - mn) * 255.0 / (mx - mn) + 0.5)
        |             AS INTEGER))) END AS c,
        |    mn, mx
        |  FROM v CROSS JOIN idx JOIN st USING (d)),
        |dec AS (
        |  SELECT vec_id, d,
        |    CAST(floor((c * (mx - mn) / 255.0 + mn) * 1000000 + 0.5)
        |      AS BIGINT) AS m
        |  FROM codes),
        |sc AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid,
        |    CAST(SUM(q.m * c.m) AS BIGINT) AS score
        |  FROM dec q JOIN dec c ON q.d = c.d
        |    AND q.vec_id < 10 AND c.vec_id <> q.vec_id
        |  GROUP BY 1, 2),
        |rnk AS (SELECT qid, vid, score,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vid) AS rk
        |  FROM sc)
        |SELECT qid, vid, score, rk FROM rnk WHERE rk <= 5
        |ORDER BY qid, rk""".stripMargin,

    // q130's SQ8 encode/decode replay feeding q85's pair + recursive-CC
    // tail: exact integer micro dots and squared norms, cos rounded at
    // 1e-4, label-blocked pairs, min-label cluster resolution.
    "q144_sq8_semantic_dedup" ->
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |idx AS (SELECT CAST(d AS INTEGER) AS d FROM range(64) t(d)),
        |st AS (SELECT d, MIN(v[d + 1]) AS mn, MAX(v[d + 1]) AS mx
        |       FROM v CROSS JOIN idx GROUP BY d),
        |codes AS (
        |  SELECT vec_id, label, d,
        |    CASE WHEN mx <= mn THEN 0
        |         ELSE LEAST(255, GREATEST(0,
        |           CAST(floor((v[d + 1] - mn) * 255.0 / (mx - mn) + 0.5)
        |             AS INTEGER))) END AS c,
        |    mn, mx
        |  FROM v CROSS JOIN idx JOIN st USING (d)),
        |dec AS (
        |  SELECT vec_id, label, d,
        |    CAST(floor((c * (mx - mn) / 255.0 + mn) * 1000000 + 0.5)
        |      AS BIGINT) AS m
        |  FROM codes),
        |n2 AS (SELECT vec_id, CAST(SUM(m * m) AS BIGINT) AS n2
        |       FROM dec GROUP BY 1),
        |prs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(SUM(a.m * b.m) AS BIGINT) AS dt
        |  FROM dec a JOIN dec b
        |    ON a.label = b.label AND a.d = b.d AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM prs JOIN n2 na ON na.vec_id = prs.id_a
        |    JOIN n2 nb ON nb.vec_id = prs.id_b
        |  WHERE ROUND(CAST(dt AS DOUBLE) /
        |    (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), 4)
        |    >= 0.2),
        |e AS (SELECT id_a AS s, id_b AS d FROM pairs
        |      UNION ALL SELECT id_b, id_a FROM pairs),
        |wk AS (
        |  SELECT s AS id, s AS lbl FROM e
        |  UNION
        |  SELECT e.d, wk.lbl FROM wk JOIN e ON e.s = wk.id)
        |SELECT id AS vec_id, MIN(lbl) AS cluster,
        |  id = MIN(lbl) AS is_canonical
        |FROM wk GROUP BY id""".stripMargin,

    // mirrors Pca.gramianMicro: micro-unit quantization, then exact
    // BIGINT moment sums (co-moments j>=i>=0, first moments j=-1,
    // count at (-1,-1))
    "q123_pca_gramian" ->
      """WITH mic AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
        |  FROM embeddings),
        |idx AS (SELECT CAST(i AS BIGINT) AS i FROM range(64) t(i))
        |SELECT a.i, b.i AS j, CAST(SUM(m[a.i + 1] * m[b.i + 1]) AS BIGINT) AS s
        |FROM mic CROSS JOIN idx a JOIN idx b ON b.i >= a.i
        |GROUP BY 1, 2
        |UNION ALL
        |SELECT idx.i, CAST(-1 AS BIGINT) AS j, CAST(SUM(m[idx.i + 1]) AS BIGINT) AS s
        |FROM mic CROSS JOIN idx GROUP BY 1, 2
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j,
        |  CAST(COUNT(*) AS BIGINT) AS s FROM mic
        |ORDER BY i, j""".stripMargin,
    // mirrors Similarity.randomProject: md5("rp:j:d") parity signs,
    // BIGINT micro-unit sums, rounded-double scale-back
    "q95_random_projection" ->
      """WITH pl AS (
        |  SELECT p, d, CASE WHEN CAST('0x' || substr(md5('rp:' || CAST(p AS VARCHAR)
        |      || ':' || CAST(d AS VARCHAR)), 1, 1) AS INTEGER) % 2 = 0
        |    THEN 1 ELSE -1 END AS w
        |  FROM range(8) tp(p) CROSS JOIN range(64) td(d))
        |, sums AS (
        |  SELECT e.vec_id, pl.p AS j,
        |    SUM(CAST(FLOOR(CAST(e.embedding[pl.d + 1] AS DOUBLE) * 1000000 + 0.5)
        |        AS BIGINT) * pl.w) AS s
        |  FROM embeddings e CROSS JOIN pl GROUP BY 1, 2)
        |SELECT vec_id, j,
        |  CAST(CASE WHEN s < 0 THEN -((-s + 50) // 100)
        |            ELSE (s + 50) // 100 END AS DOUBLE) / 10000 AS proj_r
        |FROM sums""".stripMargin,

    // mirrors Similarity.rpRerankTopK: q95's projection CTE feeds an
    // integer L2 shortlist, then the q79-style exact micro-L2 rerank
    "q98_rp_rerank" ->
      """WITH pl AS (
        |  SELECT p, d, CASE WHEN CAST('0x' || substr(md5('rp:' || CAST(p AS VARCHAR)
        |      || ':' || CAST(d AS VARCHAR)), 1, 1) AS INTEGER) % 2 = 0
        |    THEN 1 ELSE -1 END AS w
        |  FROM range(8) tp(p) CROSS JOIN range(64) td(d)),
        |mic AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |pm AS (
        |  SELECT m.vec_id, pl.p AS j, SUM(m.v[pl.d + 1] * pl.w) AS s
        |  FROM mic m CROSS JOIN pl GROUP BY 1, 2),
        |dp AS (
        |  SELECT qs.vec_id AS qid, cs.vec_id AS vid,
        |    SUM((qs.s - cs.s) * (qs.s - cs.s)) AS dist_p
        |  FROM pm qs JOIN pm cs
        |    ON qs.j = cs.j AND qs.vec_id < 50 AND cs.vec_id <> qs.vec_id
        |  GROUP BY 1, 2),
        |sl AS (
        |  SELECT qid, vid FROM (
        |    SELECT qid, vid,
        |      row_number() OVER (PARTITION BY qid ORDER BY dist_p, vid) AS rk
        |    FROM dp) WHERE rk <= 50),
        |rr AS (
        |  SELECT sl.qid, sl.vid,
        |    SUM((qm.v[t.d + 1] - vm.v[t.d + 1])
        |      * (qm.v[t.d + 1] - vm.v[t.d + 1])) AS dist
        |  FROM sl
        |  JOIN mic qm ON qm.vec_id = sl.qid
        |  JOIN mic vm ON vm.vec_id = sl.vid, range(64) t(d)
        |  GROUP BY 1, 2)
        |SELECT qid, vid, dist FROM (
        |  SELECT qid, vid, CAST(dist AS BIGINT) AS dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rk
        |  FROM rr) WHERE rk <= 5""".stripMargin,

    "q26_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |z AS (
        |  SELECT q.qid, e.vec_id AS vid,
        |    unnest(q.qe) AS a, unnest(e.embedding) AS b
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
        |s AS (
        |  SELECT qid, vid,
        |    SUM(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) AS dt,
        |    SUM(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) AS qq,
        |    SUM(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS cc
        |  FROM z GROUP BY qid, vid)
        |SELECT qid, vid, cos_r FROM (
        |  SELECT qid, vid, ROUND(dt / (SQRT(qq) * SQRT(cc)), 4) AS cos_r,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ROUND(dt / (SQRT(qq) * SQRT(cc)), 4) DESC, vid) AS rk
        |  FROM s)
        |WHERE rk <= 5""".stripMargin,

    "q27_embedding_neardup" ->
      """WITH pairs AS (
        |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.embedding AS va, b.embedding AS vb
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id),
        |z AS (
        |  SELECT label, id_a, id_b, unnest(va) AS x, unnest(vb) AS y FROM pairs),
        |s AS (
        |  SELECT label, id_a, id_b,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dt,
        |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS aa,
        |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS bb
        |  FROM z GROUP BY 1, 2, 3)
        |SELECT label, id_a, id_b, ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) AS cos_r
        |FROM s WHERE ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) >= 0.45""".stripMargin,

    // mirrors lshTopKMd5: Rademacher signs from md5('p:d') first-nibble
    // parity; projections in integer micro-units (floor(x*1e6 + 0.5)) so
    // the sign decision is exact; then the q26 scoring pattern restricted
    // to same-bucket pairs
    "q42_lsh_ann" ->
      """WITH pl AS (
        |  SELECT p, d, CASE WHEN CAST('0x' || substr(md5(CAST(p AS VARCHAR)
        |      || ':' || CAST(d AS VARCHAR)), 1, 1) AS INTEGER) % 2 = 0
        |    THEN 1 ELSE -1 END AS w
        |  FROM range(6) tp(p) CROSS JOIN range(64) td(d)),
        |pr AS (
        |  SELECT e.vec_id, pl.p,
        |    SUM(CAST(FLOOR(CAST(e.embedding[pl.d + 1] AS DOUBLE) * 1000000 + 0.5)
        |        AS BIGINT) * pl.w) AS s
        |  FROM embeddings e CROSS JOIN pl GROUP BY 1, 2),
        |bk AS (
        |  SELECT vec_id,
        |    SUM(CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS bkt
        |  FROM pr GROUP BY vec_id),
        |q AS (SELECT e.vec_id AS qid, e.embedding AS qe, b.bkt AS qb
        |      FROM embeddings e JOIN bk b ON e.vec_id = b.vec_id WHERE e.vec_id < 50),
        |c AS (SELECT e.vec_id AS vid, e.embedding AS ce, b.bkt AS cb
        |      FROM embeddings e JOIN bk b ON e.vec_id = b.vec_id),
        |z AS (SELECT qid, vid, unnest(qe) AS a, unnest(ce) AS b
        |      FROM q JOIN c ON qb = cb AND vid <> qid),
        |s AS (
        |  SELECT qid, vid,
        |    SUM(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) AS dt,
        |    SUM(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) AS qq,
        |    SUM(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS cc
        |  FROM z GROUP BY qid, vid)
        |SELECT qid, vid, cos_r FROM (
        |  SELECT qid, vid, ROUND(dt / (SQRT(qq) * SQRT(cc)), 4) AS cos_r,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ROUND(dt / (SQRT(qq) * SQRT(cc)), 4) DESC, vid) AS rk
        |  FROM s)
        |WHERE rk <= 5""".stripMargin,

    // mirrors ivfTopK: centroids = 16 corpus rows by (md5(vec_id), vec_id)
    // order; cell assignment / probes / final ranking all on ROUND(cos, 4)
    // with id tie-breaks — identical ranks in both engines
    "q60_ivf_ann" ->
      """WITH cent AS (
        |  SELECT vec_id AS cid, embedding AS centv FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |az AS (SELECT e.vec_id AS vid, c.cid, unnest(e.embedding) AS x,
        |         unnest(c.centv) AS y
        |       FROM embeddings e CROSS JOIN cent c),
        |ac AS (
        |  SELECT vid, cid,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dt,
        |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS aa,
        |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS bb
        |  FROM az GROUP BY 1, 2),
        |asg AS (
        |  SELECT vid, cid FROM (
        |    SELECT vid, cid, row_number() OVER (PARTITION BY vid
        |      ORDER BY ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) DESC, cid) AS rn
        |    FROM ac) WHERE rn = 1),
        |prb AS (
        |  SELECT vid AS qid, cid FROM (
        |    SELECT vid, cid, row_number() OVER (PARTITION BY vid
        |      ORDER BY ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) DESC, cid) AS rn
        |    FROM ac WHERE vid < 50) WHERE rn <= 4),
        |pairs AS (
        |  SELECT p.qid, a.vid FROM prb p JOIN asg a ON p.cid = a.cid
        |  WHERE a.vid <> p.qid),
        |z AS (SELECT pr.qid, pr.vid, unnest(q.embedding) AS a,
        |        unnest(v.embedding) AS b
        |      FROM pairs pr JOIN embeddings q ON q.vec_id = pr.qid
        |                    JOIN embeddings v ON v.vec_id = pr.vid),
        |s AS (
        |  SELECT qid, vid,
        |    SUM(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) AS dt,
        |    SUM(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) AS qq,
        |    SUM(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS cc
        |  FROM z GROUP BY qid, vid)
        |SELECT qid, vid, cos_r FROM (
        |  SELECT qid, vid, ROUND(dt / (SQRT(qq) * SQRT(cc)), 4) AS cos_r,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ROUND(dt / (SQRT(qq) * SQRT(cc)), 4) DESC, vid) AS rk
        |  FROM s)
        |WHERE rk <= 5""".stripMargin,

    "q78_pq_ann" ->
      """WITH mic AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |pick AS (
        |  SELECT * FROM (
        |    SELECT v, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |    FROM mic) WHERE j < 16),
        |dst AS (
        |  SELECT e.vec_id, s.m, p.j,
        |    SUM((e.v[s.m*4 + t.d + 1] - p.v[s.m*4 + t.d + 1])
        |      * (e.v[s.m*4 + t.d + 1] - p.v[s.m*4 + t.d + 1])) AS dd
        |  FROM mic e, pick p, range(16) s(m), range(4) t(d)
        |  GROUP BY e.vec_id, s.m, p.j),
        |enc AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT vec_id, m, j,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, j) AS rn
        |    FROM dst) WHERE rn = 1),
        |sc AS (
        |  SELECT dq.vec_id AS qid, e.vec_id AS vid, CAST(SUM(dq.dd) AS BIGINT) AS dist
        |  FROM enc e JOIN dst dq ON dq.m = e.m AND dq.j = e.code
        |  WHERE dq.vec_id < 50 AND e.vec_id <> dq.vec_id
        |  GROUP BY 1, 2)
        |SELECT qid, vid, dist FROM (
        |  SELECT qid, vid, dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rk
        |  FROM sc) WHERE rk <= 5""".stripMargin,

    // q60's IVF probe CTEs composed with q78's PQ code CTEs: ADC scores
    // restricted to (query, cell) probe pairs.
    "q124_ivfpq_ann" ->
      """WITH cent AS (
        |  SELECT vec_id AS cid, embedding AS centv FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |az AS (SELECT e.vec_id AS vid, c.cid, unnest(e.embedding) AS x,
        |         unnest(c.centv) AS y
        |       FROM embeddings e CROSS JOIN cent c),
        |ac AS (
        |  SELECT vid, cid,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dt,
        |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS aa,
        |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS bb
        |  FROM az GROUP BY 1, 2),
        |asg AS (
        |  SELECT vid, cid FROM (
        |    SELECT vid, cid, row_number() OVER (PARTITION BY vid
        |      ORDER BY ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) DESC, cid) AS rn
        |    FROM ac) WHERE rn = 1),
        |prb AS (
        |  SELECT vid AS qid, cid FROM (
        |    SELECT vid, cid, row_number() OVER (PARTITION BY vid
        |      ORDER BY ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) DESC, cid) AS rn
        |    FROM ac WHERE vid < 50) WHERE rn <= 4),
        |mic AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |pick AS (
        |  SELECT * FROM (
        |    SELECT v, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |    FROM mic) WHERE j < 16),
        |dst AS (
        |  SELECT e.vec_id, s.m, p.j,
        |    SUM((e.v[s.m*4 + t.d + 1] - p.v[s.m*4 + t.d + 1])
        |      * (e.v[s.m*4 + t.d + 1] - p.v[s.m*4 + t.d + 1])) AS dd
        |  FROM mic e, pick p, range(16) s(m), range(4) t(d)
        |  GROUP BY e.vec_id, s.m, p.j),
        |enc AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT vec_id, m, j,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, j) AS rn
        |    FROM dst) WHERE rn = 1),
        |sc AS (
        |  SELECT pr.qid, a.vid, CAST(SUM(dq.dd) AS BIGINT) AS dist
        |  FROM prb pr
        |  JOIN asg a ON a.cid = pr.cid AND a.vid <> pr.qid
        |  JOIN enc e ON e.vec_id = a.vid
        |  JOIN dst dq ON dq.vec_id = pr.qid AND dq.m = e.m AND dq.j = e.code
        |  GROUP BY 1, 2)
        |SELECT qid, vid, dist FROM (
        |  SELECT qid, vid, dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rk
        |  FROM sc) WHERE rk <= 5""".stripMargin,

    "q79_pq_rerank" ->
      """WITH mic AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
        |  FROM embeddings),
        |pick AS (
        |  SELECT * FROM (
        |    SELECT v, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
        |    FROM mic) WHERE j < 16),
        |dst AS (
        |  SELECT e.vec_id, s.m, p.j,
        |    SUM((e.v[s.m*4 + t.d + 1] - p.v[s.m*4 + t.d + 1])
        |      * (e.v[s.m*4 + t.d + 1] - p.v[s.m*4 + t.d + 1])) AS dd
        |  FROM mic e, pick p, range(16) s(m), range(4) t(d)
        |  GROUP BY e.vec_id, s.m, p.j),
        |enc AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT vec_id, m, j,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, j) AS rn
        |    FROM dst) WHERE rn = 1),
        |sc AS (
        |  SELECT dq.vec_id AS qid, e.vec_id AS vid, SUM(dq.dd) AS adc
        |  FROM enc e JOIN dst dq ON dq.m = e.m AND dq.j = e.code
        |  WHERE dq.vec_id < 50 AND e.vec_id <> dq.vec_id
        |  GROUP BY 1, 2),
        |sl AS (
        |  SELECT qid, vid FROM (
        |    SELECT qid, vid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc, vid) AS rk
        |    FROM sc) WHERE rk <= 50),
        |rr AS (
        |  SELECT sl.qid, sl.vid,
        |    SUM((qm.v[t.d + 1] - vm.v[t.d + 1])
        |      * (qm.v[t.d + 1] - vm.v[t.d + 1])) AS dist
        |  FROM sl
        |  JOIN mic qm ON qm.vec_id = sl.qid
        |  JOIN mic vm ON vm.vec_id = sl.vid, range(64) t(d)
        |  GROUP BY 1, 2)
        |SELECT qid, vid, dist FROM (
        |  SELECT qid, vid, CAST(dist AS BIGINT) AS dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rk
        |  FROM rr) WHERE rk <= 5""".stripMargin,

    // mirrors Clustering.kmeans(k=8, iters=2): seeds = vec_id < 8 with
    // coords rounded to 6dp, per-pair d2 rounded to 4dp before the
    // argmin (ties -> lowest cid), recomputed centroid means rounded to
    // 6dp — rounding at each step resyncs cross-engine floating point
    "q102_kmeans" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |c1 AS (SELECT vec_id AS cid, list_transform(e, x -> ROUND(x, 6)) AS ce
        |       FROM v WHERE vec_id < 8),
        |z1 AS (SELECT v.vec_id, c.cid, unnest(v.e) AS a, unnest(c.ce) AS b
        |       FROM v CROSS JOIN c1 c),
        |d1 AS (SELECT vec_id, cid, ROUND(SUM((a - b) * (a - b)), 4) AS d2
        |       FROM z1 GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid AS cluster FROM (
        |         SELECT vec_id, cid, d2,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
        |         FROM d1) WHERE rk = 1),
        |m AS (SELECT a1.cluster, t.pos, ROUND(AVG(v.e[t.pos + 1]), 6) AS mc
        |      FROM a1 JOIN v USING (vec_id), range(64) t(pos)
        |      GROUP BY 1, 2),
        |c2 AS (SELECT cluster AS cid, list(mc ORDER BY pos) AS ce FROM m GROUP BY 1),
        |z2 AS (SELECT v.vec_id, c.cid, unnest(v.e) AS a, unnest(c.ce) AS b
        |       FROM v CROSS JOIN c2 c),
        |dd AS (SELECT vec_id, cid, ROUND(SUM((a - b) * (a - b)), 4) AS d2
        |       FROM z2 GROUP BY 1, 2)
        |SELECT vec_id, cluster, d2_r FROM (
        |  SELECT vec_id, cid AS cluster, d2 AS d2_r,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
        |  FROM dd) WHERE rk = 1""".stripMargin,

    "q103_cluster_sample" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |c1 AS (SELECT vec_id AS cid, list_transform(e, x -> ROUND(x, 6)) AS ce
        |       FROM v WHERE vec_id < 8),
        |z1 AS (SELECT v.vec_id, c.cid, unnest(v.e) AS a, unnest(c.ce) AS b
        |       FROM v CROSS JOIN c1 c),
        |d1 AS (SELECT vec_id, cid, ROUND(SUM((a - b) * (a - b)), 4) AS d2
        |       FROM z1 GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid AS cluster FROM (
        |         SELECT vec_id, cid, d2,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
        |         FROM d1) WHERE rk = 1),
        |m AS (SELECT a1.cluster, t.pos, ROUND(AVG(v.e[t.pos + 1]), 6) AS mc
        |      FROM a1 JOIN v USING (vec_id), range(64) t(pos)
        |      GROUP BY 1, 2),
        |c2 AS (SELECT cluster AS cid, list(mc ORDER BY pos) AS ce FROM m GROUP BY 1),
        |z2 AS (SELECT v.vec_id, c.cid, unnest(v.e) AS a, unnest(c.ce) AS b
        |       FROM v CROSS JOIN c2 c),
        |dd AS (SELECT vec_id, cid, ROUND(SUM((a - b) * (a - b)), 4) AS d2
        |       FROM z2 GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid AS cluster FROM (
        |         SELECT vec_id, cid, d2,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
        |         FROM dd) WHERE rk = 1)
        |SELECT cluster, vec_id FROM (
        |  SELECT cluster, vec_id,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM a2) WHERE rk <= 10
        |ORDER BY cluster, vec_id""".stripMargin
  )
}
