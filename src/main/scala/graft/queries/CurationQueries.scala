package graft.queries

import graft.Tables
import graft.operators.{Boilerplate, Bpe, Retrieval, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 curation/assembly additions: boilerplate segment removal,
  * inverted-index BM25 retrieval, weighted sampling without replacement,
  * and BPE tokenizer-training pair statistics — each the oracle-gated
  * deterministic twin of an operator in graft.operators.
  */
object CurationQueries extends QueryModule {

  private val winTokens = 8
  private val bmQueries = Seq(
    (1L, "table scan fast"),
    (2L, "join merge batch"),
    (3L, "window agg stream"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RefinedWeb/C4-style boilerplate removal: 8-token windows recurring
    // in >= 2 distinct docs are template chrome; drop every occurrence
    // and reassemble. One shuffle to count segment document-frequency,
    // broadcast anti-join to remove, one shuffle to reassemble.
    "q115_boilerplate" -> ((s, dir) => {
      import s.implicits._
      Boilerplate.stripFrequentWindows(Tables.documents(s, dir),
        "doc_id", "text", winTokens = winTokens, minDocs = 2)
        .select($"doc_id", $"n_segments", $"n_dropped",
          $"text".as("stripped"))
        .orderBy($"doc_id")
    }),

    // Inverted-index BM25 retrieval: build postings once, search a
    // 3-query batch for top-5. Query side broadcast; the only search
    // shuffle aggregates matched postings per (query, doc). Per-term
    // contributions quantized to DECIMAL(18,9) BEFORE the sum so the
    // aggregate is order-free and engine-exact (q84 conventions).
    "q116_bm25_retrieval" -> ((s, dir) => {
      import s.implicits._
      val idx = Retrieval.buildIndex(Tables.documents(s, dir), "doc_id", "text")
      val qs = bmQueries.toDF("query_id", "qtext")
      Retrieval.searchBm25(idx, qs, k = 5)
        .orderBy($"query_id", $"rk")
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis): 50
    // docs weighted by n_chars, deterministic md5-derived uniforms,
    // ordering key quantized to DECIMAL(20,15). TakeOrdered top-k — no
    // global sort.
    "q117_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      Sampling.weightedSampleByHash(Tables.documents(s, dir),
        "doc_id", "n_chars", k = 50, seed = 0L)
        .select($"doc_id", $"n_chars", $"wkey")
        .orderBy($"wkey".desc, $"doc_id")
    }),

    // BPE tokenizer training, round-0 statistics: adjacent character
    // pairs weighted by word frequency — the distributed argmax feed of
    // Bpe.train (the full merge loop is spec'd against a single-node
    // reference in BpeSpec; this gates its corpus-scale aggregation).
    "q118_bpe_pairs" -> ((s, dir) => {
      import s.implicits._
      val wf = Bpe.wordFrequencies(Tables.documents(s, dir), "text")
        .withColumn("syms", Bpe.charSymbols($"word"))
      Bpe.pairCounts(wf)
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(30)
    }),

    // PageRank over the customer↔supplier trade graph (2 iterations,
    // exact-integer micro-unit ranks — the host-graph importance signal
    // of a web-corpus pipeline, on the star schema's natural bipartite
    // graph). Node ids: customer c -> 2c, supplier s -> 2s+1; edges run
    // both directions so mass actually propagates.
    "q119_pagerank" -> ((s, dir) => {
      import s.implicits._
      val ol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sup"))
        .distinct()
      val edges = ol.select($"c".as("src"), $"sup".as("dst"))
        .union(ol.select($"sup".as("src"), $"c".as("dst")))
      graft.operators.Graphs.pageRank(edges, iters = 2)
        .orderBy($"id")
    })
  )

  override def oracles: Map[String, String] = Map(

    "q115_boilerplate" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id,
         |    unnest(range(1, greatest(len(words), 1) + 1, $winTokens)) AS pos
         |  FROM w),
         |seg2 AS (
         |  SELECT p.doc_id, pos,
         |    array_to_string(w.words[pos:pos+${winTokens - 1}], ' ') AS seg
         |  FROM pos p JOIN w USING (doc_id)),
         |freq AS (
         |  SELECT seg FROM seg2 WHERE trim(seg) <> ''
         |  GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (
         |  SELECT doc_id, pos, seg FROM seg2
         |  WHERE seg NOT IN (SELECT seg FROM freq)),
         |tot AS (SELECT doc_id, COUNT(*) AS n_segments FROM seg2 GROUP BY doc_id),
         |reb AS (
         |  SELECT doc_id, COUNT(*) AS n_kept,
         |    string_agg(seg, ' ' ORDER BY pos) AS stripped
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, tot.n_segments,
         |  tot.n_segments - COALESCE(reb.n_kept, 0) AS n_dropped,
         |  COALESCE(reb.stripped, '') AS stripped
         |FROM documents d JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q116_bm25_retrieval" ->
      s"""WITH q(query_id, qtext) AS (VALUES
         |  ${bmQueries.map { case (i, t) => s"($i, '$t')" }.mkString(", ")}),
         |w AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
         |    len(string_split_regex(trim(text), '\\s+')) AS len
         |  FROM documents),
         |p AS (SELECT doc_id, len, unnest(w) AS term FROM w),
         |post AS (SELECT term, doc_id, len, COUNT(*) AS tf
         |         FROM p GROUP BY 1, 2, 3),
         |terms AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |  CAST(SUM(CAST(len AS BIGINT)) AS DOUBLE) AS sumlen FROM w),
         |qt AS (
         |  SELECT query_id,
         |    unnest(list_distinct(string_split_regex(trim(qtext), '\\s+'))) AS term
         |  FROM q),
         |contrib AS (
         |  SELECT qt.query_id, post.doc_id,
         |    CAST((ln((n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
         |      (CAST(tf AS DOUBLE) * ${1.2 + 1.0}) /
         |      (CAST(tf AS DOUBLE) + 1.2 * (${1.0 - 0.75} + 0.75 *
         |        (CAST(post.len AS DOUBLE) / (sumlen / n))))) AS DECIMAL(18,9)) AS c
         |  FROM qt JOIN terms USING (term) JOIN post USING (term)
         |  CROSS JOIN stats),
         |sc AS (SELECT query_id, doc_id, SUM(c) AS sdec
         |       FROM contrib GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, doc_id, sdec,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY sdec DESC, doc_id) AS rk
         |  FROM sc)
         |SELECT query_id, doc_id, rk, CAST(sdec AS DOUBLE) AS score
         |FROM rk WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin,

    "q117_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  CAST(CAST(
        |    ln((CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 6)
        |         AS BIGINT) + 0.5) / 16777216.0)
        |    / CAST(n_chars AS DOUBLE)
        |  AS DECIMAL(20,15)) AS DOUBLE) AS wkey
        |FROM documents
        |WHERE n_chars > 0
        |ORDER BY CAST(
        |    ln((CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 6)
        |         AS BIGINT) + 0.5) / 16777216.0)
        |    / CAST(n_chars AS DOUBLE)
        |  AS DECIMAL(20,15)) DESC, doc_id
        |LIMIT 50""".stripMargin,

    "q118_bpe_pairs" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents),
        |wf AS (SELECT word, COUNT(*) AS freq FROM t WHERE word <> ''
        |       GROUP BY word),
        |pc AS (
        |  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, freq
        |  FROM (SELECT word, freq, unnest(range(1, len(word))) AS i
        |        FROM wf WHERE len(word) >= 2))
        |SELECT a, b, SUM(freq) AS cnt FROM pc
        |GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 30""".stripMargin,

    // Integer PageRank, 2 unrolled iterations: r0 = scale // n;
    // r_{k+1} = base + (85 * sum(r_k // outdeg over in-edges)) // 100.
    // All floor divisions on non-negative integers — identical in both
    // engines; summation order can't matter on exact integers.
    "q119_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0
        |      UNION ALL SELECT dst, src FROM e0),
        |nodes AS (SELECT DISTINCT src AS id FROM e
        |          UNION SELECT dst FROM e),
        |deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |params AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT id, 1000000000000 // n AS rank
        |       FROM nodes CROSS JOIN params),
        |c1 AS (SELECT e.dst AS id, SUM(r0.rank // deg.outdeg) AS s
        |       FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.id
        |       GROUP BY 1),
        |r1 AS (SELECT nodes.id,
        |         (1000000000000 * 15 // 100) // n
        |           + (85 * COALESCE(c1.s, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN params LEFT JOIN c1 USING (id)),
        |c2 AS (SELECT e.dst AS id, SUM(r1.rank // deg.outdeg) AS s
        |       FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.id
        |       GROUP BY 1),
        |r2 AS (SELECT nodes.id,
        |         (1000000000000 * 15 // 100) // n
        |           + (85 * COALESCE(c2.s, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN params LEFT JOIN c2 USING (id))
        |SELECT id, CAST(rank AS BIGINT) AS rank FROM r2 ORDER BY id""".stripMargin
  )
}
