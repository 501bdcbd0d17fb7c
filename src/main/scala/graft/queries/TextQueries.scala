package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis / dedup surface over the `documents` table — the
  * training-data-pipeline operators (token stats, quality scoring, exact
  * dedup, n-gram Jaccard, MinHash+LSH near-dup, content fingerprinting).
  * All hash-bearing steps use md5 so the DuckDB oracle reproduces them
  * exactly; production variants (xxhash64) live in graft.functions.
  */
object TextQueries extends QueryModule {
  import Q._

  private val stops = Seq("the", "a", "of", "to", "and", "is")
  private val stopsSql = stops.map(s => s"'$s'").mkString(", ")

  /** DuckDB CTE: tokenized + 3-word-shingled documents (mirrors
    * TextFunctions.tokens / wordShingles).
    */
  private[queries] val docShingles =
    """w AS (SELECT doc_id, lang, source, text, n_chars,
      |        string_split_regex(trim(text), '\s+') AS words FROM documents),
      |shl AS (SELECT *, list_distinct(list_transform(
      |          range(1, greatest(len(words) - 1, 1)),
      |          i -> array_to_string(words[i:i+2], ' '))) AS shingles FROM w),
      |sh AS (SELECT doc_id, lang, unnest(shingles) AS shingle FROM shl),
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token statistics per language.
    "q20_doc_stats" -> ((spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("nt", tokenCount($"text"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"source").as("n_sources"),
          sum($"nt").as("sum_tokens"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"))
        .orderBy($"lang")
    }),

    // Exact-dup profile per source: distinct text digests vs rows.
    "q21_dedup_exact" -> ((spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5($"text")).as("n_distinct"),
          min($"doc_id").as("first_doc"))
        .orderBy($"source")
    }),

    // Quality scoring: stopword-ratio buckets per language.
    "q22_quality_buckets" -> ((spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("nt", tokenCount($"text"))
        .withColumn("hits", stopwordHits($"text", stops))
        .withColumn("bucket",
          floor(($"hits".cast("double") / $"nt".cast("double")) * 10).cast("long"))
        .groupBy($"lang", $"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"nt").as("sum_tokens"))
        .orderBy($"lang", $"bucket")
    }),

    // Exact 3-gram Jaccard near-dup pairs (same-language blocking),
    // shingle-join verified — finds the corpus's planted near-duplicates.
    // maxShingleFreq caps stop-shingle skew (a shingle in >50 docs carries
    // no similarity signal but quadratic pair cost) AND bounds the
    // per-shingle id list, so the one-shuffle collect_list shape is safe.
    "q23_ngram_jaccard" -> ((spark, dir) => {
      Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
          n = 3, blockCol = Some("lang"), maxShingleFreq = 50)
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "inter", "un", "jaccard")
    }),

    // MinHash (k=8) + LSH (4 bands x 2 rows) near-dup candidates, verified
    // by exact Jaccard >= 0.5.
    "q24_minhash_lsh" -> ((spark, dir) => {
      Dedup.minhashNearDups(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.5, shingleN = 3, k = 8, bands = 4)
    }),

    // Winnowing-style content fingerprint: min md5 over char 8-grams.
    "q25_fingerprint" -> ((spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", charFingerprint($"text", 8).as("fp"))
    }),

    // Oracle-verifiable SimHash near-dup pipeline (32-bit md5 variant):
    // signature -> prefix block -> hamming.
    "q50_simhash_md5" -> ((spark, dir) =>
      Dedup.simhashNearDupsMd5(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 4, prefixBits = 8)),

    // Wide (48-bit) SimHash near-dup pairs, md5-derived so the whole
    // pipeline is oracle-checked. The 64-bit xxhash64 production form
    // (Dedup.simhashNearDups) is golden-tested in OperatorsSpec — 48 bits
    // is the widest signature that stays strictly positive in a signed
    // long, which keeps prefix shifts engine-neutral.
    "q40_simhash_neardup" -> ((spark, dir) =>
      Dedup.simhashNearDupsMd5(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 8, prefixBits = 8, bits = 48)),

    // Production-hash MinHash+LSH near-dups: xxhash64 signatures, 8 bands
    // of 2 rows (candidate P = 1-(1-j²)^8: vanishing for unrelated docs,
    // ~1 above the threshold — rows=1 banding collides unrelated docs at
    // rate j per band, which explodes quadratically at scale), then
    // hash-free exact-Jaccard verification. Output equals the exact
    // jaccard >= 0.6 pair set, which the oracle computes directly — the
    // engine-specific hashes never reach the output.
    "q44_minhash_fast" -> ((spark, dir) =>
      Dedup.minhashNearDupsFast(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.6, shingleN = 3, k = 16, bands = 8)),

    // Token budgeting: whitespace tokens vs BPE-style pre-tokens per
    // language (corpus sizing for training runs) — both counts are pure
    // regex column ops, no shuffle beyond the final small aggregate.
    "q64_token_count" -> ((spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("ws", tokenCount($"text"))
        .withColumn("bpe", bpeTokenCount($"text"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"ws").as("ws_tokens"),
          sum($"bpe").as("bpe_tokens"),
          max($"bpe").as("max_bpe"))
        .orderBy($"lang")
    }),

    // Sequence packing (concat-and-chunk): docs laid head-to-tail in
    // doc_id order, exact token offsets via the two-level DISTRIBUTED
    // prefix sum (no corpus-wide single-partition window — see Packing
    // scaladoc), cut into fixed 512-token packs. bucketWidth 256
    // exercises the multi-bucket path at gate SF (dense ids -> ~20
    // buckets at sf0.1); all outputs are integers.
    "q72_seq_packing" -> ((spark, dir) => {
      import spark.implicits._
      val toks = Tables.documents(spark, dir)
        .select($"doc_id", tokenCount($"text").cast("long").as("n_tokens"))
      graft.operators.Packing
        .packByBudget(toks, "doc_id", "n_tokens", budget = 512L, bucketWidth = 256L)
        .select("doc_id", "n_tokens", "start_off", "end_off",
          "pack_first", "pack_last", "n_packs")
    }),

    // Deterministic corpus shuffle (training order): md5(seed:id) ->
    // (shard, pos) — 8 shards, per-shard rank windows, no global sort.
    "q100_det_shuffle" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Sampling.deterministicShuffle(
          Tables.documents(spark, dir).select($"doc_id"),
          "doc_id", shards = 8, seed = 7L)
        .select($"doc_id", $"shard", $"pos".cast("long").as("pos"))
    }),

    // Length-bucketed dynamic batching: token-length buckets of width 8,
    // 4 docs per batch in id order — all-integer, window keyed by bucket.
    "q101_length_batches" -> ((spark, dir) => {
      import spark.implicits._
      val toks = Tables.documents(spark, dir)
        .select($"doc_id", tokenCount($"text").cast("long").as("n_tokens"))
      graft.operators.Packing.lengthBatches(
        toks, "doc_id", "n_tokens", bucketTokens = 8, batchSize = 4)
    }),

    // Pack-level roll-up of q72: docs starting per pack + seam
    // (boundary-crossing) counts — the packing-quality dashboard numbers.
    "q73_pack_summary" -> ((spark, dir) => {
      import spark.implicits._
      val toks = Tables.documents(spark, dir)
        .select($"doc_id", tokenCount($"text").cast("long").as("n_tokens"))
      graft.operators.Packing.packSummary(
        graft.operators.Packing.packByBudget(
          toks, "doc_id", "n_tokens", budget = 512L, bucketWidth = 256L))
    }),

    // Chunk-blocked EXACT-recall SimHash near-dups (pigeonhole: h+1
    // disjoint chunks, a pair within radius h shares >= 1) — the oracle is
    // literally the brute-force all-pairs hamming set, so this gate row IS
    // the recall-1 proof on the corpus.
    "q63_simhash_exact" -> ((spark, dir) =>
      Dedup.simhashNearDupsExactMd5(Tables.documents(spark, dir), "doc_id",
        "text", maxHamming = 6, bits = 48)),

    // Repetition-based quality signals (the Gopher-style rep filters):
    // within-doc duplicate-word mass and the share of the most frequent
    // bigram. All sums are exact integers — the per-language ratios
    // divide two exact sums, so the compare is order-independent.
    "q70_rep_quality" -> ((spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val base = docs.select($"doc_id", $"lang",
          tokenCount($"text").as("nt"),
          size(array_distinct(tokens($"text"))).as("nd"))
      val bigrams = docs.select($"doc_id",
          explode(wordShinglesAll($"text", 2)).as("bg"))
        .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(max($"c").as("top_bigram"), sum($"c").as("n_bigrams"))
      base.join(bigrams, Seq("doc_id"), "left")
        .groupBy($"lang")
        .agg(sum($"nt").as("sum_tokens"),
          sum($"nd").as("sum_distinct"),
          round(lit(1.0) - sum($"nd").cast("double") / sum($"nt").cast("double"), 6)
            .as("dup_frac"),
          sum(coalesce($"top_bigram", lit(0L))).as("sum_top_bigram"),
          sum(coalesce($"n_bigrams", lit(0L))).as("sum_bigrams"))
        .orderBy($"lang")
    }),

    // Consistent (hash-ordered) per-language sample: deterministic across
    // runs/engines and stable under appends — the sampling a multi-week
    // training run can rely on (operators.Sampling).
    "q68_consistent_sample" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Sampling.consistentSamplePerGroup(
          Tables.documents(spark, dir), Seq("lang"), "doc_id", n = 5)
        .select($"lang", $"doc_id")
        .orderBy($"lang", $"doc_id")
    }),

    // Deterministic train/val/test split by id hash: same id -> same
    // split, forever and across tables; counts per (lang, split).
    "q69_split_by_hash" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Sampling.splitByHash(Tables.documents(spark, dir),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"))
        .orderBy($"lang", $"split")
    }),

    // word2vec frequent-word subsampling (Mikolov 2013 §2.3): each
    // token occurrence survives with min(1, sqrt(1e-3/(f/T))); the
    // threshold is one correctly-rounded sqrt per vocab entry (the
    // q140 sqrt precedent) and the per-occurrence uniform is the md5
    // bucket off (doc, pos). thresh=1e-3 so the small fixture actually
    // thins its head words.
    "q154_word_subsample" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Sampling.subsampleFrequentWords(
          Tables.documents(spark, dir), "doc_id", "text", thresh = 1e-3)
        .orderBy($"doc_id")
    }),

    // Stratified deterministic sample: per-language keep fraction via
    // the md5 bucket threshold (clean fractions -> exact integer
    // thresholds in both engines). Summary output so the gate checks
    // WHICH rows survived, not just how many.
    "q74_stratified_sample" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Sampling.stratifiedSampleByHash(
          Tables.documents(spark, dir), "lang", "doc_id",
          Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25, "fr" -> 0.1, "es" -> 0.1))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"), sum($"doc_id").as("sum_doc"))
        .orderBy($"lang")
    }),

    // Weighted corpus mixing: downsample each language toward integer
    // target weights, binding stratum keeps 100%. Thresholds are exact
    // integer arithmetic over the observed counts, so the DuckDB oracle
    // re-derives them from the same table.
    "q75_corpus_mix" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Sampling.mixCorpus(
          Tables.documents(spark, dir), "lang", "doc_id",
          Map("en" -> 4, "zh" -> 2, "de" -> 2, "fr" -> 1, "es" -> 1))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), min($"doc_id").as("first_doc"),
          sum($"doc_id").as("sum_doc"))
        .orderBy($"lang")
    }),

    // Overlapping token-window chunking (RAG / fixed-context splits):
    // 32-token chunks, stride 24 — one narrow flatMap, chunks
    // byte-reproduced by the oracle (md5 over the joined tokens).
    "q76_token_chunks" -> ((spark, dir) => {
      import spark.implicits._
      graft.operators.Chunking.slidingTokenChunks(
          Tables.documents(spark, dir), "doc_id", "text", size = 32, stride = 24)
        .select($"doc_id", $"chunk_idx", $"chunk_tokens",
          md5($"chunk_text").as("chunk_md5"))
    }),

    // Corpus mixing weighted by TOKENS (what mixture weights actually
    // mean in a training run): thresholds re-derived from per-language
    // token sums with the same exact-integer rule as q75.
    "q77_token_mix" -> ((spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
        .withColumn("n_tokens", tokenCount($"text").cast("long"))
      graft.operators.Sampling.mixCorpusByMeasure(docs, "lang", "doc_id",
          "n_tokens", Map("en" -> 4, "zh" -> 2, "de" -> 2, "fr" -> 1, "es" -> 1))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), sum($"n_tokens").as("kept_tokens"),
          min($"doc_id").as("first_doc"))
        .orderBy($"lang")
    }),

    // Flagship training-corpus selection pipeline — the composition a
    // 100 TB data pipeline actually runs, end-to-end in one gate row:
    // exact dedup (keep-first) -> MinHash+LSH near-dup removal (drop the
    // larger id of each verified pair) -> quality gate (stopword ratio +
    // length) -> per-language doc/token budget. Every stage is
    // md5-reproducible, so the DuckDB oracle replays the whole pipeline.
    "q65_corpus_select" -> ((spark, dir) => {
      import spark.implicits._
      val d0 = Dedup.exactDedup(Tables.documents(spark, dir), "doc_id", "text")
      val nd = Dedup.minhashNearDups(d0, "doc_id", "text",
        threshold = 0.5, shingleN = 3, k = 8, bands = 4)
      val kept = d0.join(nd.select($"id_b".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      kept
        .withColumn("nt", tokenCount($"text"))
        .withColumn("ratio", stopwordRatio($"text", stops))
        .filter($"n_chars" >= 100 && $"ratio".between(0.05, 0.6))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"nt").as("tokens"))
        .orderBy($"lang")
    })
  )

  /** DuckDB mirror of Dedup.simhashMd5 + prefix-blocked hamming pairs —
    * the per-bit majority sums are generated, not hand-written.
    * Parameterized on signature width / prefix / radius so q50 (32-bit)
    * and q40 (48-bit) share one generator.
    */
  /** Shared CTE chain: per-doc `bits`-wide md5 simhash signature. */
  private def simhashSigCtes(bits: Int): String = {
    val bitSums = (0 until bits)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n    ")
    val sig = (0 until bits)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(t), 1, ${bits / 4}) AS BIGINT) AS h
       |  FROM tok),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sig AS simhash FROM bits)""".stripMargin
  }

  private def simhashMd5Sql(bits: Int, prefixBits: Int, maxHamming: Int): String =
    s"""${simhashSigCtes(bits)},
       |p AS (SELECT doc_id, simhash, simhash >> ${bits - prefixBits} AS prefix FROM sig)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM p a JOIN p b ON a.prefix = b.prefix AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  /** Brute-force all-pairs hamming — the oracle for the chunk-blocked
    * EXACT variant (whose whole point is equality with this).
    */
  private def simhashExactMd5Sql(bits: Int, maxHamming: Int): String =
    s"""${simhashSigCtes(bits)}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q20_doc_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS sum_tokens,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q21_dedup_exact" ->
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct,
        |  MIN(doc_id) AS first_doc
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q22_quality_buckets" ->
      s"""WITH t AS (
         |  SELECT lang, len(string_split_regex(trim(text), '\\s+')) AS nt,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> x IN ($stopsSql))) AS hits
         |  FROM documents)
         |SELECT lang,
         |  CAST(FLOOR((CAST(hits AS DOUBLE) / CAST(nt AS DOUBLE)) * 10) AS BIGINT) AS bucket,
         |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS sum_tokens
         |FROM t GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    // mirrors jaccardPairs(maxShingleFreq = 50): stop-shingles (in >50
    // docs) are dropped BEFORE pair generation and doc sizes — sz here is
    // post-prune, matching the operator
    "q23_ngram_jaccard" ->
      s"""WITH $docShingles,
         |keep AS (
         |  SELECT shingle FROM sh GROUP BY shingle
         |  HAVING COUNT(DISTINCT doc_id) <= 50),
         |shp AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
         |szp AS (SELECT doc_id, COUNT(*) AS sz FROM shp GROUP BY doc_id),
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM shp a JOIN shp b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id AND a.lang = b.lang
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, inter, sa.sz + sb.sz - inter AS un,
         |  CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
         |FROM pr JOIN szp sa ON id_a = sa.doc_id JOIN szp sb ON id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5""".stripMargin,

    "q24_minhash_lsh" ->
      s"""WITH $docShingles,
         |sig AS (
         |  SELECT doc_id,
         |    list_min(list_transform(shingles, s -> md5('0#' || s))) AS m0,
         |    list_min(list_transform(shingles, s -> md5('1#' || s))) AS m1,
         |    list_min(list_transform(shingles, s -> md5('2#' || s))) AS m2,
         |    list_min(list_transform(shingles, s -> md5('3#' || s))) AS m3,
         |    list_min(list_transform(shingles, s -> md5('4#' || s))) AS m4,
         |    list_min(list_transform(shingles, s -> md5('5#' || s))) AS m5,
         |    list_min(list_transform(shingles, s -> md5('6#' || s))) AS m6,
         |    list_min(list_transform(shingles, s -> md5('7#' || s))) AS m7
         |  FROM shl),
         |bands AS (
         |  SELECT doc_id, 0 AS band, md5('0:' || m0 || ':' || m1) AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, md5('1:' || m2 || ':' || m3) FROM sig
         |  UNION ALL SELECT doc_id, 2, md5('2:' || m4 || ':' || m5) FROM sig
         |  UNION ALL SELECT doc_id, 3, md5('3:' || m6 || ':' || m7) FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT c.id_a, c.id_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
         |FROM cand c
         |JOIN pr ON c.id_a = pr.id_a AND c.id_b = pr.id_b
         |JOIN sz sa ON c.id_a = sa.doc_id JOIN sz sb ON c.id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5""".stripMargin,

    "q25_fingerprint" ->
      """SELECT doc_id,
        |  list_min(list_transform(range(1, greatest(len(text) - 6, 1)),
        |    i -> md5(substr(text, i, 8)))) AS fp
        |FROM documents""".stripMargin,

    "q50_simhash_md5" -> simhashMd5Sql(bits = 32, prefixBits = 8, maxHamming = 4),

    // full pipeline replay: dedup -> shingles over the deduped set ->
    // md5 minhash bands -> verified near-dup pairs -> drop id_b -> quality
    // gate -> per-language budget
    "q65_corpus_select" ->
      s"""WITH ded AS (
         |  SELECT doc_id, lang, text, n_chars FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |w AS (SELECT doc_id, lang, text, n_chars,
         |        string_split_regex(trim(text), '\\s+') AS words FROM ded),
         |shl AS (SELECT *, list_distinct(list_transform(
         |          range(1, greatest(len(words) - 1, 1)),
         |          i -> array_to_string(words[i:i+2], ' '))) AS shingles FROM w),
         |sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM shl),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id,
         |    list_min(list_transform(shingles, s -> md5('0#' || s))) AS m0,
         |    list_min(list_transform(shingles, s -> md5('1#' || s))) AS m1,
         |    list_min(list_transform(shingles, s -> md5('2#' || s))) AS m2,
         |    list_min(list_transform(shingles, s -> md5('3#' || s))) AS m3,
         |    list_min(list_transform(shingles, s -> md5('4#' || s))) AS m4,
         |    list_min(list_transform(shingles, s -> md5('5#' || s))) AS m5,
         |    list_min(list_transform(shingles, s -> md5('6#' || s))) AS m6,
         |    list_min(list_transform(shingles, s -> md5('7#' || s))) AS m7
         |  FROM shl),
         |bands AS (
         |  SELECT doc_id, 0 AS band, md5('0:' || m0 || ':' || m1) AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, md5('1:' || m2 || ':' || m3) FROM sig
         |  UNION ALL SELECT doc_id, 2, md5('2:' || m4 || ':' || m5) FROM sig
         |  UNION ALL SELECT doc_id, 3, md5('3:' || m6 || ':' || m7) FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |nd AS (
         |  SELECT c.id_a, c.id_b FROM cand c
         |  JOIN pr ON c.id_a = pr.id_a AND c.id_b = pr.id_b
         |  JOIN sz sa ON c.id_a = sa.doc_id JOIN sz sb ON c.id_b = sb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5),
         |kept AS (
         |  SELECT * FROM w WHERE doc_id NOT IN (SELECT id_b FROM nd)),
         |q AS (
         |  SELECT lang, n_chars, len(words) AS nt,
         |    len(list_filter(words, x -> x IN ($stopsSql))) AS hits
         |  FROM kept)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS tokens
         |FROM q
         |WHERE n_chars >= 100
         |  AND CAST(hits AS DOUBLE) / CAST(nt AS DOUBLE) BETWEEN 0.05 AND 0.6
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q40_simhash_neardup" -> simhashMd5Sql(bits = 48, prefixBits = 8, maxHamming = 8),

    "q63_simhash_exact" -> simhashExactMd5Sql(bits = 48, maxHamming = 6),

    "q70_rep_quality" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    len(string_split_regex(trim(text), '\s+')) AS nt,
        |    len(list_distinct(string_split_regex(trim(text), '\s+'))) AS nd
        |  FROM documents),
        |w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |      FROM documents),
        |bgl AS (
        |  SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(ws), 1)),
        |      i -> array_to_string(ws[i:i+1], ' '))) AS bg
        |  FROM w WHERE len(ws) >= 2),
        |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgl GROUP BY 1, 2),
        |bga AS (SELECT doc_id, MAX(c) AS top_bigram, SUM(c) AS n_bigrams
        |        FROM bgc GROUP BY doc_id)
        |SELECT b.lang,
        |  CAST(SUM(b.nt) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(b.nd) AS BIGINT) AS sum_distinct,
        |  ROUND(1.0 - CAST(SUM(b.nd) AS DOUBLE) / CAST(SUM(b.nt) AS DOUBLE), 6)
        |    AS dup_frac,
        |  CAST(SUM(COALESCE(a.top_bigram, 0)) AS BIGINT) AS sum_top_bigram,
        |  CAST(SUM(COALESCE(a.n_bigrams, 0)) AS BIGINT) AS sum_bigrams
        |FROM base b LEFT JOIN bga a ON b.doc_id = a.doc_id
        |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    "q68_consistent_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5
        |ORDER BY lang, doc_id""".stripMargin,

    // bounds for (0.8, 0.1, 0.1) over 10000 buckets: 8000, 9000, 10000
    "q69_split_by_hash" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 10000 AS b
        |  FROM documents),
        |lab AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN b < 8000 THEN 'train'
        |         WHEN b < 9000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM s)
        |SELECT lang, split, COUNT(*) AS n, MIN(doc_id) AS first_doc
        |FROM lab GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    // Survival threshold floor(sqrt(1e-3·T/f)·1e6) per vocab entry
    // (LEAST caps rare words at always-keep); uniform = md5 bucket off
    // 'doc:pos' — the same ':'-joined key the engine hashes.
    "q154_word_subsample" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE len(trim(text)) > 0),
        |tok AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS tok, CAST(i AS BIGINT) AS pos
        |  FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)),
        |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1),
        |tt AS (SELECT CAST(SUM(f) AS BIGINT) AS tt FROM f),
        |k AS (SELECT tok,
        |        LEAST(1000000, CAST(floor(sqrt(1e-3 * tt / f) * 1e6)
        |          AS BIGINT)) AS keep_micro
        |      FROM f CROSS JOIN tt),
        |sel AS (
        |  SELECT tok.doc_id,
        |    CAST('0x' || substr(md5(CAST(tok.doc_id AS VARCHAR) || ':' ||
        |      CAST(tok.pos AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS u,
        |    k.keep_micro
        |  FROM tok JOIN k USING (tok))
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN u < keep_micro THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept
        |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin,

    "q76_token_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        |  FROM documents),
        |x AS (SELECT doc_id, words, len(words) AS n FROM w),
        |e AS (
        |  SELECT doc_id, words, n,
        |    unnest(range(1 + greatest((n - 32 + 23) // 24, 0))) AS i
        |  FROM x)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(least(32, n - i*24) AS BIGINT) AS chunk_tokens,
        |  md5(array_to_string(words[i*24+1 : i*24+32], ' ')) AS chunk_md5
        |FROM e""".stripMargin,

    // same threshold derivation as q75, measured in tokens
    "q77_token_mix" ->
      """WITH wt(lang, wt) AS (
        |  VALUES ('en', 4), ('zh', 2), ('de', 2), ('fr', 1), ('es', 1)),
        |tok AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |cnt AS (
        |  SELECT t.lang, ANY_VALUE(wt.wt) AS wt,
        |    CAST(SUM(t.n_tokens) AS BIGINT) AS n
        |  FROM tok t JOIN wt ON t.lang = wt.lang
        |  GROUP BY t.lang),
        |m AS (
        |  SELECT a.lang AS mlang, a.wt AS mwt, a.n AS mn FROM cnt a
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cnt b
        |    WHERE b.n * a.wt < a.n * b.wt
        |       OR (b.n * a.wt = a.n * b.wt AND b.lang < a.lang))),
        |thr AS (
        |  SELECT c.lang,
        |    LEAST((10000 * c.wt * m.mn) // (m.mwt * c.n), 10000) AS t
        |  FROM cnt c, m),
        |s AS (
        |  SELECT lang, doc_id, n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 10000 AS b
        |  FROM tok),
        |k AS (
        |  SELECT s.lang, s.doc_id, s.n_tokens
        |  FROM s JOIN thr ON s.lang = thr.lang WHERE s.b < thr.t)
        |SELECT lang, COUNT(*) AS n_kept,
        |  CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
        |  MIN(doc_id) AS first_doc
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // thresholds floor(frac*10000): en 5000, zh/de 2500, fr/es 1000
    "q74_stratified_sample" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 10000 AS b
        |  FROM documents),
        |k AS (
        |  SELECT lang, doc_id FROM s
        |  WHERE (lang = 'en' AND b < 5000) OR (lang = 'zh' AND b < 2500)
        |     OR (lang = 'de' AND b < 2500) OR (lang = 'fr' AND b < 1000)
        |     OR (lang = 'es' AND b < 1000))
        |SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc,
        |  MAX(doc_id) AS last_doc, CAST(SUM(doc_id) AS BIGINT) AS sum_doc
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // re-derives the integer mix thresholds from the table: binding
    // stratum m minimizes n/w (cross-multiplied, name tie-break), every
    // stratum keeps (10000 * w_s * n_m) // (w_m * n_s) buckets
    "q75_corpus_mix" ->
      """WITH w(lang, wt) AS (
        |  VALUES ('en', 4), ('zh', 2), ('de', 2), ('fr', 1), ('es', 1)),
        |cnt AS (
        |  SELECT d.lang, ANY_VALUE(w.wt) AS wt, COUNT(*) AS n
        |  FROM documents d JOIN w ON d.lang = w.lang
        |  GROUP BY d.lang),
        |m AS (
        |  SELECT a.lang AS mlang, a.wt AS mwt, a.n AS mn FROM cnt a
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cnt b
        |    WHERE b.n * a.wt < a.n * b.wt
        |       OR (b.n * a.wt = a.n * b.wt AND b.lang < a.lang))),
        |thr AS (
        |  SELECT c.lang,
        |    LEAST((10000 * c.wt * m.mn) // (m.mwt * c.n), 10000) AS t
        |  FROM cnt c, m),
        |s AS (
        |  SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 10000 AS b
        |  FROM documents),
        |k AS (
        |  SELECT s.lang, s.doc_id
        |  FROM s JOIN thr ON s.lang = thr.lang WHERE s.b < thr.t)
        |SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // mirrors Sampling.deterministicShuffle: md5(seed:id) keys, unsigned
    // 32-bit prefix mod shards, per-shard (key, id) rank
    "q100_det_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, k,
        |    CAST('0x' || substr(k, 1, 8) AS BIGINT) % 8 AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
        |    AS BIGINT) AS pos
        |FROM s""".stripMargin,

    // mirrors Packing.lengthBatches: width-8 token buckets, 4 docs per
    // batch in id order, all-integer floor division
    "q101_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (SELECT doc_id, n_tokens, n_tokens // 8 AS bucket FROM t)
        |SELECT doc_id, n_tokens, bucket,
        |  (CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
        |    AS BIGINT) - 1) // 4 AS batch_id
        |FROM b""".stripMargin,

    "q72_seq_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
        |  FROM t)
        |SELECT doc_id, n_tokens, end_off - n_tokens AS start_off, end_off,
        |  (end_off - n_tokens) // 512 AS pack_first,
        |  CASE WHEN n_tokens > 0 THEN (end_off - 1) // 512
        |       ELSE (end_off - n_tokens) // 512 END AS pack_last,
        |  CASE WHEN n_tokens > 0 THEN (end_off - 1) // 512
        |       ELSE (end_off - n_tokens) // 512 END
        |    - (end_off - n_tokens) // 512 + 1 AS n_packs
        |FROM c""".stripMargin,

    "q73_pack_summary" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
        |  FROM t),
        |p AS (
        |  SELECT doc_id, n_tokens, end_off - n_tokens AS start_off, end_off,
        |    (end_off - n_tokens) // 512 AS pack_first,
        |    CASE WHEN n_tokens > 0 THEN (end_off - 1) // 512
        |         ELSE (end_off - n_tokens) // 512 END AS pack_last
        |  FROM c)
        |SELECT pack_first AS pack_id, COUNT(*) AS n_docs,
        |  CAST(SUM(pack_last - pack_first) AS BIGINT) AS n_boundary_crossings,
        |  MIN(start_off) AS first_off, MAX(end_off) AS last_off
        |FROM p GROUP BY pack_first""".stripMargin,

    "q64_token_count" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '''(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))) AS BIGINT) AS bpe_tokens,
        |  CAST(MAX(len(regexp_extract_all(text,
        |    '''(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))) AS INTEGER) AS max_bpe
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // the oracle computes the exact jaccard >= 0.6 pair set directly (no
    // LSH): with 8 bands × 2 rows the xxhash64 candidate pass misses a
    // verified pair with probability (1-j²)^8 <= 2e-6 on this corpus
    // (planted pairs have j >= 0.9) — recall 1, asserted by this gate row
    "q44_minhash_fast" ->
      s"""WITH $docShingles,
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
         |FROM pr JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.6""".stripMargin
  )
}
