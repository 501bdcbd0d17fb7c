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

    // IVF ANN (rows-only: centroid sample is xxhash-picked, not
    // oracle-reproducible; recall vs brute force asserted in
    // OperatorsSpec).
    "q60_ivf_ann" -> ((spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", k = 5, nlist = 16, nProbe = 4)
    })
  )

  override def oracles: Map[String, String] = Map(
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
        |FROM s WHERE ROUND(dt / (SQRT(aa) * SQRT(bb)), 4) >= 0.45""".stripMargin
  )
}
