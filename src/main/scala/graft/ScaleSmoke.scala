package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke for the corpus operators (dedup / near-dup / ANN): runs
  * them on an N-fold replication of the sf0.1 tables and asserts the
  * plan shapes that matter at 100 TB hold on the EXECUTED plan —
  * no CartesianProduct in any dedup pipeline, no partitionless window
  * over unaggregated input, broadcast on the query/centroid side only.
  *
  * Replication plants structure on purpose:
  *  - replica 1 copies the text verbatim -> every doc has one EXACT dup
  *    (exercises exactDedup and the LSH bucket caps on dup clusters);
  *  - replicas 2..R append a replica tag -> near-dup clusters of size
  *    R-1 with high-but-<1 Jaccard (exercises candidate banding and the
  *    pair-targeted verify at a candidate volume ~C(R-1,2) per doc);
  *  - embeddings get a per-replica nudge on one component -> distinct
  *    vectors with tight neighborhoods.
  *
  * Prints one `SCALE <op> <sec> <rows>` line per operator and a
  * `SCALE plan_checks PASS` line; run via
  * `SPARK_GRAFT_SCALE_REP=8 sbt "runMain graft.ScaleSmoke"`.
  */
object ScaleSmoke {
  private final val Off = 10000000L

  def replicateDocs(docs: DataFrame, rep: Int): DataFrame =
    docs
      .select(explode(sequence(lit(0), lit(rep - 1))).as("r"), col("doc_id"),
        col("text"), col("lang"), col("source"))
      .select(
        (col("r") * Off + col("doc_id")).as("doc_id"),
        when(col("r") <= 1, col("text"))
          .otherwise(concat(col("text"), lit(" zz"), col("r"))).as("text"),
        col("lang"), col("source"))

  def replicateEmbeddings(emb: DataFrame, rep: Int): DataFrame =
    emb
      .select(explode(sequence(lit(0), lit(rep - 1))).as("r"), col("vec_id"),
        col("embedding"))
      .select(
        (col("r") * Off + col("vec_id")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + col("r").cast("float") * lit(0.001f))
            .otherwise(x)).as("embedding"))

  /** Builds the frame AND executes df.count() inside the timing window
    * (by-name `df`: eager operators — the CC loop's localCheckpoint
    * rounds — bill their work here, not to the caller's line).
    */
  private def timed(df: => DataFrame, force: Boolean = false)
      : (Double, Long, org.apache.spark.sql.execution.SparkPlan) = {
    val t0 = System.nanoTime()
    val built = df
    // force=true: materialize EVERY output column (count() lets the
    // optimizer prune map-side expressions — a map-only operator would
    // time its scan, not its work). Used by the round-10 rows.
    val n = if (force) built.queryExecution.toRdd.count() else built.count()
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, n, built.queryExecution.executedPlan)
  }

  private def assertShapes(op: String,
      root: org.apache.spark.sql.execution.SparkPlan,
      allowBroadcastNlj: Boolean): Unit =
    graft.plans.PlanWalk.assertShapes(op, root, allowBroadcastNlj)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REP", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions scale with the replication factor (the cluster
    // sizing rule: hold per-task shuffle state roughly constant as data
    // grows; a 100 TB run sizes partitions to the data, not the core
    // count). AQE coalesces the excess on small stages, so over-
    // partitioning costs nothing; under-partitioning at 80x put ~10 GB
    // of pair-join state on each of 32 tasks and went spill-bound.
    val parts = (cpus.toInt * math.max(1, rep / 8)).toString
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts),
      GraftSession.longFuse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Spread the replicated corpus across the cores BEFORE the typed
    // CPU passes (tokenize/shingle/hash): the local fixture is ONE
    // parquet split, so without this every pre-shuffle stage — exactly
    // where the per-doc CPU lives — ran as a single task. A real corpus
    // arrives in thousands of splits; the repartition recreates that
    // scan parallelism, it is not an operator requirement.
    val docs = replicateDocs(Tables.documents(spark, sfDir), rep)
      .repartition(cpus.toInt * 2)
    val emb = replicateEmbeddings(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), rep)
      .repartition(cpus.toInt * 2)
    val nDocs = docs.count(); val nVec = emb.count()
    println(s"SCALE corpus ${nDocs} docs, ${nVec} vectors (rep=$rep)")

    // SPARK_GRAFT_SCALE_ONLY=minhash_neardups,dup_clusters runs a phase
    // subset while iterating; unset runs everything.
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def run(op: String, df: => DataFrame, allowBroadcastNlj: Boolean = false,
        force: Boolean = false): Unit = {
      if (only.exists(!_(op))) return
      val (sec, n, plan) = timed(df, force)
      assertShapes(op, plan, allowBroadcastNlj)
      println(f"SCALE $op%-24s $sec%8.2f sec  rows=$n")
      // isolate phases: drop cached plans + let the ContextCleaner free
      // dead localCheckpoint/persist blocks NOW — leftover blocks from a
      // heavy phase measurably tax the next one (148 s vs 28 s for the
      // CC phase inside a full run before this)
      spark.catalog.clearCache()
      System.gc()
    }

    run("exact_dedup", graft.operators.Dedup.exactDedup(docs, "doc_id", "text"))
    run("minhash_candidates", graft.operators.Dedup.minhashCandidatesFast(
      docs, "doc_id", "text", 3, 16, 8))
    run("minhash_neardups", graft.operators.Dedup.minhashNearDupsFast(
      docs, "doc_id", "text", 0.6, 3, 16, 8))
    // the round-8 AUTO default: banding derived from corpus count +
    // threshold (bandingFor) — the path a caller gets with no tuning;
    // gated here so the derived (k, bands) is smoke-proven at scale,
    // not just unit-tested
    run("minhash_neardups_auto", graft.operators.Dedup.minhashNearDupsFast(
      docs, "doc_id", "text", 0.6))
    run("simhash_neardups", graft.operators.Dedup.simhashNearDups(
      docs, "doc_id", "text", maxHamming = 3, prefixBits = 12))

    // curation tier: CC over the exact-dup digest pairs the replication
    // plants (replica 1 duplicates every text verbatim), and
    // decontamination of the corpus against a small benchmark slice
    run("dup_clusters", {
      val pairs = graft.operators.Dedup.minhashCandidatesFast(
        docs, "doc_id", "text", 3, 16, 8)
      graft.operators.Clusters.connectedComponents(pairs,
        edgesDeduped = true)
    })
    // cross-table tier: the top ~10% of REPLICAS as the incoming batch,
    // the rest as corpus — every near-dup cluster spans all replicas, so
    // this split puts members of every cluster on BOTH sides: the worst
    // case for the (band,bkey) bucket join (splitting by doc_id % k
    // would keep whole clusters on one side — replica offsets are
    // multiples of Off — and nothing would cross the boundary)
    val cut = (rep.toLong * 9 / 10) * Off
    run("incremental_dedup", graft.operators.Dedup.incrementalDedupReport(
      docs.filter(col("doc_id") >= cut),
      docs.filter(col("doc_id") < cut),
      "doc_id", "text", 3))
    run("decontaminate", graft.operators.Decontam.contaminationReport(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0 && col("doc_id") < Off),
      "doc_id", "text", 3))
    run("dup_span_coverage", graft.operators.Dedup.dupSpanCoverage(
      docs, "doc_id", "text", n = 5))
    // allowBroadcastNlj: the vocab builder cross-joins ONE broadcast
    // stats row (total token count) — a 1-row BNLJ by construction
    run("unigram_logprob", graft.operators.Quality.unigramLogprob(
      docs, "doc_id", "text"), allowBroadcastNlj = true)
    // the CC loop's per-round shapes never reach the final (checkpointed)
    // plan that `run` gates above — gate one representative round directly
    if (only.forall(_("cc_round"))) {
      val pairs = graft.operators.Dedup.minhashCandidatesFast(
        docs, "doc_id", "text", 3, 16, 8)
      val e = pairs.select(col("id_a").cast("long").as("s"),
        col("id_b").cast("long").as("d")).localCheckpoint()
      val labels0 = e.select(col("s").as("id"))
        .union(e.select(col("d").as("id"))).distinct()
        .withColumn("label", col("id"))
      val r0 = graft.operators.Clusters.neighborMinRound(labels0, e)
      r0.count()
      assertShapes("cc_round0", r0.queryExecution.executedPlan,
        allowBroadcastNlj = false)
      val live = graft.operators.Clusters.relabelLive(e, r0)
      live.count()
      assertShapes("cc_relabel", live.queryExecution.executedPlan,
        allowBroadcastNlj = false)
      val r1 = graft.operators.Clusters.liveRound(r0, live)
      r1.count()
      assertShapes("cc_round1", r1.queryExecution.executedPlan,
        allowBroadcastNlj = false)
      val contracted = graft.operators.Clusters.contractLive(live)
      contracted.count()
      assertShapes("cc_contract", contracted.queryExecution.executedPlan,
        allowBroadcastNlj = false)
      val jumped = graft.operators.Clusters.pointerJump(r1)
      jumped.count()
      assertShapes("cc_pointer_jump", jumped.queryExecution.executedPlan,
        allowBroadcastNlj = false)
      println("SCALE cc round0/relabel/round1/contract/jump plan shapes gated")
      // free the gate's full-candidate checkpoint before the next timed
      // phase — same leftover-block discipline as run()'s isolation
      graft.operators.Checkpoints.free(e)
      spark.catalog.clearCache()
      System.gc()
    }

    // vocab-level idf join + per-doc windowed top-k — both uniform keys
    run("tfidf_terms", graft.operators.Quality.tfidfTopTerms(
      docs, "doc_id", "text", k = 3), allowBroadcastNlj = true)
    // replication is the quality-HOMOGENEOUS worst case (replica docs
    // share bands): only the boundary band pays a running sum, through
    // the two-level bucket-offset prefix sum — gated here on purpose
    run("token_budget_select", graft.operators.Quality.selectByTokenBudget(
      docs, "doc_id", "text", budget = 1000000L), allowBroadcastNlj = true)
    // the WORST case for token-budget select: every doc in ONE quality
    // band (identical text -> identical score), so the entire corpus is
    // the boundary band and flows through the two-level distributed
    // prefix sum — the path whose partitionless window must stay above
    // the 2^16-bucket totals, never the raw rows
    run("token_budget_worst", graft.operators.Quality.selectByTokenBudget(
      docs.withColumn("text",
        lit("uniform quality band corpus row with identical scoring tokens")),
      "doc_id", "text", budget = 100000L), allowBroadcastNlj = true)

    val queries = emb.filter(col("vec_id") < 50)
    // map-only JL compression: rows = |corpus|·outDim, zero shuffle
    run("random_project", graft.operators.Similarity.randomProject(
      emb, "vec_id", "embedding", outDim = 8, dim = 64))
    run("ann_brute_force", graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k = 10), allowBroadcastNlj = true)
    run("ann_lsh", graft.operators.Similarity.lshTopK(
      queries, emb, "vec_id", "embedding", k = 10), allowBroadcastNlj = true)
    run("ann_ivf", graft.operators.Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", k = 10, nlist = 16, nProbe = 4),
      allowBroadcastNlj = true)
    run("ann_pq_rerank", graft.operators.Similarity.pqRerankTopK(
      queries, emb, "vec_id", "embedding", k = 10, shortlist = 50),
      allowBroadcastNlj = true)
    // combined IVF-PQ: probed cells' codes only — the corpus-sized pass
    // is the codes table; probes × ADC tables broadcast
    run("ann_ivfpq_rerank", graft.operators.Similarity.ivfPqRerankTopK(
      queries, emb, "vec_id", "embedding", k = 10, shortlist = 50),
      allowBroadcastNlj = true)
    // stored IVF: build-once/search-many — the search must read only the
    // probed cells' files off the persisted index (the 100 TB shape);
    // gated here like the OperatorsSpec plan gate, at corpus scale
    if (only.forall(_("ivf_search_stored"))) {
      val idxPath = java.nio.file.Files
        .createTempDirectory("scale_ivf").toString
      graft.operators.Similarity.ivfWriteIndex(
        emb, "vec_id", "embedding", idxPath, nlist = 32)
      val (sec, n, plan) = timed(graft.operators.Similarity.ivfSearchStored(
        spark, idxPath, queries, "vec_id", "embedding", k = 10, nProbe = 4))
      assertShapes("ivf_search_stored", plan, allowBroadcastNlj = true)
      // pruning gate on a SINGLE query (50 diverse queries legitimately
      // probe every cell — distinct probed cids is bounded by nlist, not
      // by query count): one query must read <= nProbe of nlist cells
      val one = graft.operators.Similarity.ivfSearchStored(spark, idxPath,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 10, nProbe = 4)
      one.count()
      val cellScan = graft.plans.PlanWalk
        .walk(one.queryExecution.executedPlan).collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths
                .exists(_.toString.contains("cells")) => f
        }.getOrElse(sys.error("ivf_search_stored: no cells scan in plan"))
      val partsRead = cellScan.relation.location
        .listFiles(cellScan.partitionFilters, cellScan.dataFilters).size
      val partsAll = cellScan.relation.location.listFiles(Nil, Nil).size
      require(partsRead <= 4 && partsRead < partsAll,
        s"ivf_search_stored: no physical pruning ($partsRead/$partsAll cells)")
      println(f"SCALE ivf_search_stored     $sec%8.2f sec  rows=$n " +
        s"(1-query probe reads $partsRead/$partsAll cells)")
      spark.catalog.clearCache(); System.gc()
    }
    // stored IVF-PQ: the compressed build-once/search-many shape — the
    // search must read only the probed cells' CODE files (same gate as
    // ivf_search_stored, on the ~1%-sized artifact)
    if (only.forall(_("ivfpq_search_stored"))) {
      val idxPath = java.nio.file.Files
        .createTempDirectory("scale_ivfpq").toString
      graft.operators.Similarity.ivfPqWriteIndex(
        emb, "vec_id", "embedding", idxPath, nlist = 32)
      val (sec, n, plan) = timed(graft.operators.Similarity.ivfPqSearchStored(
        spark, idxPath, queries, "vec_id", "embedding", k = 10, nProbe = 4))
      assertShapes("ivfpq_search_stored", plan, allowBroadcastNlj = true)
      val one = graft.operators.Similarity.ivfPqSearchStored(spark, idxPath,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 10, nProbe = 4)
      one.count()
      val codeScan = graft.plans.PlanWalk
        .walk(one.queryExecution.executedPlan).collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths
                .exists(_.toString.contains("codes")) => f
        }.getOrElse(sys.error("ivfpq_search_stored: no codes scan in plan"))
      val static = codeScan.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      val partsRead = codeScan.relation.location
        .listFiles(static, codeScan.dataFilters).size
      val partsAll = codeScan.relation.location.listFiles(Nil, Nil).size
      require(partsRead <= 4 && partsRead < partsAll,
        s"ivfpq_search_stored: no physical pruning ($partsRead/$partsAll cells)")
      println(f"SCALE ivfpq_search_stored   $sec%8.2f sec  rows=$n " +
        s"(1-query probe reads $partsRead/$partsAll cells)")
      spark.catalog.clearCache(); System.gc()
    }
    // Lloyd's: centroids broadcast both in the argmin assignment and as
    // the k-row seed top-k; the corpus-side scan never shuffles
    run("kmeans_2iter", graft.operators.Clustering.kmeans(
      emb, "vec_id", "embedding", k = 16, iters = 2), allowBroadcastNlj = true)
    // FastSS deletion neighborhoods over the doc FINGERPRINT strings
    // (short keys): len+1 keys/row, one shuffle. Exact-dup sigs are
    // dropped first — the operator's documented contract (m identical
    // strings would stream m^2 candidate pairs; replication plants
    // exactly that: rep copies share a sig)
    run("edit_distance_1", graft.operators.Dedup.editDistance1Pairs(
      docs.select(col("doc_id"),
        concat(col("source"), lit(":"), col("lang"), lit(":"),
          substring(col("text"), 1, 12)).as("sig"))
        .dropDuplicates("sig"),
      "doc_id", "sig"))

    // multimodal tier at corpus scale: REAL codecs (PNG decode + bilinear
    // resize + re-encode; RIFF/WAVE chunk walk) over per-row synthetic
    // payloads planted DISTRIBUTED (generated in the executors, sized by
    // doc_id — never collected). localCheckpoint so the timed phase
    // measures the operator, not payload synthesis.
    if (only.forall(o =>
        o("image_resize") || o("audio_meta") || o("video_meta"))) {
      import spark.implicits._
      val images = docs.select((col("doc_id") % 17 + 4).cast("int").as("w"),
          (col("doc_id") % 11 + 4).cast("int").as("h"), col("doc_id"))
        .as[(Int, Int, Long)]
        .map { case (w, h, id) =>
          (id, graft.multimodal.SyntheticImages.png(w, h)) }
        .toDF("id", "payload").localCheckpoint()
      run("image_resize", graft.multimodal.Multimodal.resizePartitioned(
        images, "id", "payload", maxSide = 8))
      graft.operators.Checkpoints.free(images)
      val wavs = docs.select((col("doc_id") % 4 + 1).cast("int").as("rsel"),
          (col("doc_id") % 2 + 1).cast("int").as("ch"), col("doc_id"))
        .as[(Int, Int, Long)]
        .map { case (rsel, ch, id) =>
          (id, graft.multimodal.SyntheticAudio.wav(8000 * rsel, ch, 64)) }
        .toDF("id", "payload").localCheckpoint()
      run("audio_meta", graft.multimodal.Multimodal.audioMetaPartitioned(
        wavs, "id", "payload"))
      graft.operators.Checkpoints.free(wavs)
      val avis = docs.select((col("doc_id") % 8 + 1).cast("int").as("wsel"),
          (col("doc_id") % 6 + 1).cast("int").as("hsel"), col("doc_id"))
        .as[(Int, Int, Long)]
        .map { case (wsel, hsel, id) =>
          (id, graft.multimodal.SyntheticVideo.avi(wsel * 16, hsel * 16,
            33333L, id % 509 + 24)) }
        .toDF("id", "payload").localCheckpoint()
      run("video_meta", graft.multimodal.Multimodal.videoMetaPartitioned(
        avis, "id", "payload"))
      graft.operators.Checkpoints.free(avis)
    }

    // round-9 curation additions. Replication is the boilerplate WORST
    // case: replicas 0/1 share every window verbatim, so the frequent
    // set is large and most of the corpus flows through the removal
    // anti-join + reassembly shuffle.
    run("boilerplate_strip", graft.operators.Boilerplate.stripFrequentWindows(
      docs, "doc_id", "text", winTokens = 8, minDocs = 2))
    locally {
      import spark.implicits._
      val qs = Seq((1L, "table scan fast"), (2L, "join merge batch"),
        (3L, "window agg stream")).toDF("query_id", "qtext")
      run("bm25_search", {
        val idx = graft.operators.Retrieval.buildIndex(docs, "doc_id", "text")
        graft.operators.Retrieval.searchBm25(idx, qs, k = 10)
      }, allowBroadcastNlj = true)
    }
    // key is a pure column expr; top-k plans as TakeOrdered (no sort)
    run("weighted_sample", graft.operators.Sampling.weightedSampleByHash(
      docs.withColumn("w", length(col("text"))), "doc_id", "w", k = 1000))
    // BPE round-0 feed: the one corpus-scale pass (word frequencies) +
    // the pair aggregate the merge loop's argmax reads. The loop itself
    // runs over the vocab-sized word table — corpus size doesn't touch it
    run("bpe_pair_counts", graft.operators.Bpe.pairCounts(
      graft.operators.Bpe.wordFrequencies(docs, "text")
        .withColumn("syms", graft.operators.Bpe.charSymbols(col("word")))))

    // mergeable HLL vocab sketches: one map-side-combining aggregate;
    // output is G KB-sized sketch rows at any corpus size
    run("distinct_sketch", graft.operators.Sketches.estimate(
      graft.operators.Sketches.distinctSketch(
        docs.select(col("source"),
          explode(split(trim(col("text")), "\\s+")).as("w")),
        "source", "w")))
    // histogram quantile sketch: two keyed aggregates to G·nBuckets
    // rows; the quantile window runs over sketch rows, never data rows
    run("hist_quantiles", {
      val sk = graft.operators.Sketches.histogramSketch(
        docs.withColumn("len", length(col("text"))),
        "source", "len", lo = 0.0, hi = 4096.0, nBuckets = 32)
      graft.operators.Sketches.quantilesFromHistogram(sk, "source",
        0.0, 4096.0, 32, Seq(0.5, 0.9, 0.99))
    })

    // URL canonicalization front door: codegen'd regex chain + two
    // key-partitioned window shuffles (canonical URL, then host). Hosts
    // are fanned out per doc (source x doc_id%64) so the per-host cap
    // window has real key cardinality — a 5-host corpus would be the
    // documented mega-domain skew case, not the normal shape.
    run("url_canonical", {
      val u = docs.select(col("doc_id"), length(col("text")).as("w"),
        concat(lit("https://WWW."), col("source"),
          (col("doc_id") % 64).cast("string"), lit(".Example.COM:443/Docs/Item-"),
          (col("doc_id") % 1000).cast("string"),
          lit("?utm_source=s&id="), (col("doc_id") % 1000).cast("string")).as("url"))
      graft.operators.Urls.dedupAndCapPerDomain(u, "url", "doc_id", "w", cap = 100)
    })
    // PCA fit+project: fit reduces the corpus to one d*(d+3)/2-double
    // buffer via treeAggregate (timed inside the thunk); the projection
    // plan must stay map-only — zero exchanges at any corpus size
    run("pca_fit_project", {
      val model = graft.operators.Pca.fit(emb, "embedding", dim = 64, k = 4)
      graft.operators.Pca.transform(emb, "embedding", model)
        .select(col("vec_id"), col("pc1"), col("pc4"))
    })
    // integer HITS over a doc-scale synthetic graph (|V| = |E| = corpus
    // rows): each half-step is one shuffle_hash rank-edge join + one
    // keyed aggregate; the only broadcast is the 1-row max-normalizer
    run("hits_2iter", {
      val e = docs.select(col("doc_id").as("src"),
        pmod(xxhash64(col("doc_id")), lit(nDocs)).as("dst"))
      graft.operators.Graphs.hits(e, iters = 2)
    }, allowBroadcastNlj = true)
    // SQ8 quantized ANN: fit is one model-sized-shuffle bounds pass,
    // encode+decode are map-only, search is the q26 broadcast shape —
    // cost should track the corpus scan, not the query count
    run("sq8_ann", graft.operators.Similarity.sq8TopK(
      emb.filter(col("vec_id") < 50), emb, "vec_id", "embedding",
      k = 5, dim = 64), allowBroadcastNlj = true)
    // host PageRank over co-occurrence edges (the q129 composition):
    // the (key,node) dedup/rank grows with the corpus, while the pair
    // join is bounded by maxPerKey^2 per key — the skew contract: edge
    // growth saturates at ~keys*cap^2 no matter how hot a key gets
    run("host_pagerank", {
      val hostKeys = docs.select(
        pmod(xxhash64(col("source"), col("doc_id") % 64), lit(100000L)).as("hid"),
        (col("doc_id") % 997).as("k"))
      val edges = graft.operators.Graphs.cooccurrenceEdges(
        hostKeys, "k", "hid", maxPerKey = 50)
      graft.operators.Graphs.pageRank(edges, iters = 2)
    })

    // per-document repetition signals: zero-shuffle sorted-run-length
    // folds — cost must track the corpus linearly with NO exchange
    // (assertShapes enforces the no-shuffle plan on the count itself)
    run("repetition_stats", graft.operators.Repetition.ngramStats(
      docs, "doc_id", "text", Seq(1, 2, 3)), force = true)
    run("line_dedup", graft.operators.Repetition.dedupLinesWithinDoc(
      docs.select(col("doc_id"),
        regexp_replace(col("text"), "((\\S+\\s+){2})", "$1\n").as("text")),
      "doc_id", "text"), force = true)
    // hashed-classifier gradient: one bucket-keyed partial agg whose
    // exchange moves <= buckets rows per task regardless of corpus size
    run("classifier_grad", graft.operators.Classifier.gradientAtZero(
      docs.withColumn("y", col("doc_id") % 3 === 0), "text", "y",
      buckets = 1024))
    // bigram LM: count shuffle keys on ~V^2 uniform bigrams, history
    // totals aggregate the VOCAB-sized table, scoring joins a broadcast
    // LM — corpus-linear with a vocab-bounded exchange payload
    run("bigram_lm", graft.operators.Quality.bigramLogprob(
      docs, "doc_id", "text"), allowBroadcastNlj = true, force = true)

    // DSIR: two ≤buckets-row feature-dist aggs + a broadcast-literal
    // scoring map — task output is bucket-bounded at any corpus size
    run("dsir_scores", graft.operators.Selection.dsirScores(
      docs.withColumn("is_tgt", col("lang") === "en"),
      "doc_id", "text", "is_tgt", buckets = 1024),
      allowBroadcastNlj = true, force = true)
    // corpus-level keep-first line dedup: first-occurrence table is ONE
    // digest-keyed agg with map-side min(struct) partials — a 10^9-copy
    // boilerplate line reaches the reducer as one row per task
    run("line_dedup_corpus", graft.operators.Boilerplate.dedupLinesKeepFirst(
      docs.select(col("doc_id"),
        regexp_replace(col("text"), "((\\S+\\s+){2})", "$1\n").as("text")),
      "doc_id", "text"), force = true)

    // round-11 tier ------------------------------------------------
    // CCNet terciles, BOTH forms over the same synthesized scored frame
    // (hash-derived avg_nano in the q141 grid, n = 1000 so avg_nano =
    // lp_micro — the phase times the operator, not an upstream LM):
    // the exact NTILE's per-language window partitions must grow with
    // the corpus while the sketch form's histogram agg stays flat.
    def ccnetScored = docs.select(col("doc_id"), col("lang"),
      lit(1000L).as("n"),
      (-(lit(3300000000L) +
        pmod(xxhash64(col("doc_id")), lit(300000000L)))).as("lp"))
    run("ccnet_exact", graft.operators.Selection.perplexityBuckets(
      ccnetScored, "doc_id", "lang", "n", "lp"), force = true)
    run("ccnet_sketch", graft.operators.Selection.perplexityBucketsBySketch(
      ccnetScored, "doc_id", "lang", "n", "lp",
      lo = -math.pow(2, 33), hi = 0.0, nHist = 16384), force = true)
    // exact-substring span dedup under the replication WORST case
    // (replicas duplicate every text verbatim, so nearly every anchor
    // past the first copy loses and most of the corpus is excised):
    // digest-keyed min(struct) agg + unique-key anti join + doc rebuild
    run("exactsubstr_dedup", graft.operators.Dedup.dedupSpansKeepFirst(
      docs, "doc_id", "text", n = 8), force = true)
    // frozen-weight classifier scoring: pure map, zero shuffle
    run("classifier_score", graft.operators.Classifier.scoreMicro(
      docs, "doc_id", "text",
      Array.tabulate(1024)(b => (b * 2654435761L) % 2000001L - 1000000L)),
      force = true)
    // softmax gradient at W=0: ONE (bucket, class)-keyed agg, map-side
    // capped at buckets*K rows per task; grid join is sketch-sized
    run("softmax_grad", graft.operators.Classifier.softmaxGradientAtZero(
      docs, "text", "lang", buckets = 1024), allowBroadcastNlj = true)
    // SQ8 code-tier near-dup: hash blocks sized ~64 vectors keep the
    // pair scan corpus-LINEAR (~32 pairs/vector); at production scale
    // the block column is an LSH bucket or cluster id
    run("sq8_neardup", graft.operators.Similarity.blockedNearDupsSq8(
      emb.withColumn("blk",
        pmod(xxhash64(col("vec_id")), lit(math.max(1L, nVec / 64)))),
      "vec_id", "embedding", "blk", threshold = 0.2, dim = 64),
      force = true)
    // frozen multi-class scoring (q147): typed per-row kernel, zero
    // shuffle — like classifier_score this should be corpus-linear
    run("softmax_score", graft.operators.Classifier.scoreSoftmaxMicro(
      docs, "doc_id", "text",
      Array.tabulate(4, 256)((k, b) =>
        ((b + 1) * (k + 3) * 2654435761L) % 2000001L - 1000000L),
      Array("en", "de", "fr", "zz")), force = true)
    // incremental span dedup (q148) under the replication worst case:
    // every 10th row arrives as the batch, the rest are the accepted
    // corpus — replicas duplicate texts verbatim so nearly every batch
    // anchor collides with a corpus digest (max anti-join traffic).
    // Only the BATCH side is rebuilt; the corpus contributes one
    // min-key row per digest to the join.
    run("exactsubstr_incremental",
      graft.operators.Dedup.dedupSpansIncremental(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 8), force = true)
    // skip-gram co-occurrence (q149): typed flatMap (≤ 2·window rows
    // per token) + ONE pair-keyed agg with map-side partials — the
    // replication multiplies every pair count by rep, so the DISTINCT
    // pair set (≈ the agg's reduce side) stays ~fixed while the map
    // side grows: wall time should track the flatMap, not the shuffle
    run("skipgram_pairs", graft.operators.Cooccurrence.skipgramPairs(
      docs, "text", window = 4, minCount = 3L), force = true)
    // cross-corpus decontamination (q150): shuffled hash join on the
    // shingle key — both sides corpus-sized, the regime where q81's
    // broadcast contract breaks
    run("decontam_shuffle", graft.operators.Decontam.contaminationReportShuffle(
      docs.filter(col("doc_id") % 2 =!= 0),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 3), force = true)
    // PMI over the pruned pair matrix (q151): the corpus cost is the
    // same flatMap+agg as skipgram_pairs (checkpointed once); the PMI
    // tier itself is vocab-keyed joins over the ~fixed distinct-pair
    // set, so the DELTA over skipgram_pairs should stay flat with rep
    // allowBroadcastNlj: the 1-row matrix-total frame broadcasts (the
    // unigram_logprob shape)
    run("pmi_pairs", graft.operators.Cooccurrence.pmiPairs(
      docs, "text", window = 4, minCount = 3L),
      allowBroadcastNlj = true, force = true)
    // per-doc token entropy (q152): two uniform-key shuffles, no corpus
    // state — corpus-linear like the repetition report
    run("token_entropy", graft.operators.Quality.tokenEntropy(
      docs, "doc_id", "text"), force = true)
    // host-disjoint split (q153): pure column expressions — the curve
    // is the scan (synthetic URL derived off doc_id per replica)
    run("host_split", graft.operators.Sampling.splitByHostHash(
      docs.withColumn("url", concat(lit("https://site"),
        (col("doc_id") % 97).cast("string"), lit(".example.com/item/"),
        col("doc_id").cast("string"))),
      "url", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)), force = true)
    // word2vec subsampling (q154): the unigram_logprob shape — vocab
    // agg + 1-row broadcast + vocab-keyed survival join + doc rollup
    run("word_subsample", graft.operators.Sampling.subsampleFrequentWords(
      docs, "doc_id", "text", thresh = 1e-3),
      allowBroadcastNlj = true, force = true)
    // negative-sampling table (q155): vocab agg + TakeOrdered top-V +
    // a ≤ V-row prefix window — the corpus term is the one agg
    run("neg_sampling", graft.operators.Cooccurrence.negativeSamplingTable(
      docs, "text", maxVocab = 100000), force = true)
    // corpus snapshot diff (q156): digest map per side + ONE id-keyed
    // full-outer hash join (payload = id/digest/length, never texts)
    run("corpus_diff", graft.io.Layout.corpusDiff(
      docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 11 =!= 0).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source")),
      "doc_id", "text"), force = true)

    // round-12 analytics tier ------------------------------------------
    // exact winsorize (q160): the rank window funnels each source's rows
    // through ONE task's sort — measured here precisely because it is the
    // shape that degrades with per-key volume; the sketch twin below is
    // the production path (histogram agg + map-only clamp, no sort)
    run("winsorize_exact", graft.operators.Relational.winsorizedStats(
      docs.withColumn("n_chars", length(col("text"))),
      "source", "n_chars", "doc_id", 5, 95), force = true)
    run("winsorize_sketch", graft.operators.Relational.winsorizedStatsBySketch(
      docs.withColumn("n_chars", length(col("text"))),
      "source", "n_chars", 5, 95, lo = 0L, width = 16L, nBuckets = 4096),
      force = true)
    // rank-blend selection (q164): two rank windows + top-k, all on the
    // lang key — same caveat as winsorize_exact (per-language sorts); the
    // signals ride the row, so the curve is the window sort cost.
    // BOTH blend forms consume the SAME materialized signals frame (the
    // production contract: blending runs over a persisted score table;
    // without this the sketch form's two passes re-paid the fixture's
    // replicate+repartition once per pass — a fixture recompute tax the
    // exact form's single pass never sees, not operator cost)
    // lazy + by-name run() args: the checkpoint only materializes when
    // one of the two blend phases is actually selected
    lazy val blendIn = docs.select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("len_sig"),
        (col("doc_id") % 997).cast("long").as("aux_sig"))
      .localCheckpoint()
    run("score_blend", graft.operators.Selection.blendByRank(
      blendIn,
      "doc_id", "lang", "len_sig", "aux_sig", k = 100), force = true)
    // rollup cube (q157): Expand(3x rows) + ONE map-side-combined agg —
    // the output is |sources|x|langs| bounded whatever the corpus size
    run("token_cube", docs
      .select(col("source"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
      .rollup(col("source"), col("lang"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens")), force = true)
    // moment sums (q162): one partial-aggregated shuffle of 6 longs per
    // group — the corr gate's corpus pass, expected ~scan-bound
    run("corr_moments", graft.operators.Quality.momentSums(
      docs.select(col("source"), length(col("text")).cast("long").as("x"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("y")),
      "source", "x", "y"), force = true)

    // round-13 tier ------------------------------------------------
    // q169's production blend (same synthetic signals as score_blend so
    // the two rows compare head to head): per-signal histogram
    // percentiles broadcast back, banded top-k — the curve must stay
    // flat where score_blend's per-language window sorts grow
    run("blend_sketch", graft.operators.Selection.blendByRankBySketch(
      blendIn,
      "doc_id", "lang", "len_sig", "aux_sig", k = 100,
      loA = 0L, widthA = 1L, nHistA = 16384,
      loB = 0L, widthB = 1L, nHistB = 1024,
      blendWidth = 128L), force = true)
    if (only.forall(s => s("score_blend") || s("blend_sketch")))
      graft.operators.Checkpoints.free(blendIn)
    // distinct-cardinality cube (q172), exact vs mergeable-HLL: the
    // exact tier's shuffle carries every distinct (source, lang, key)
    // triple (grows with the corpus); the HLL tier's carries one KB
    // sketch per grouping-set cell (bounded) — the pair is the measured
    // argument for sketches under ROLLUP
    run("distinct_cube_exact", docs
      .select(col("source"), col("lang"),
        (col("doc_id") % 100000).as("k"))
      .rollup(col("source"), col("lang"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        countDistinct(col("k")).as("d")), force = true)
    run("distinct_cube_hll", graft.operators.Sketches.distinctRollup(
      docs.select(col("source"), col("lang"),
        (col("doc_id") % 100000).as("k")),
      Seq("source", "lang"), "k"), force = true)

    // heavy hitters (q190), naive vs two-pass MG: a 10%-heavy / 90%-
    // near-unique item space (the URL/user-agent shape) makes the
    // asymmetry measurable — the naive top-k shuffles one row per
    // DISTINCT item (grows with the corpus), the MG pass shuffles at
    // most capacity·|partitions| summary rows plus the candidate-only
    // recount. The printed volumes are the 100 TB argument even where
    // local seconds tie.
    val hhToks = docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .select(when(pmod(col("pos"), lit(10)) === 0, col("tok"))
        .otherwise(concat(col("tok"), lit("_"), col("doc_id"), lit("_"),
          col("pos"))).as("item"))
    run("topk_vocab_shuffle", hhToks.groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item")).limit(10), force = true)
    // allowBroadcastNlj: the exactness certificate cross-joins a 1-row
    // (N, decrement-rounds) stats frame onto the k retained rows — the
    // designed 1-row-broadcast shape (PlanGateSpec allowlist: q190/q200)
    run("topk_mg_twopass", graft.operators.Freq.exactTopK(
      hhToks, "item", k = 10, capacity = 4096),
      allowBroadcastNlj = true, force = true)
    if (only.forall(s => s("topk_vocab_shuffle") || s("topk_mg_twopass"))) {
      val naive = hhToks.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("item")).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val mg = graft.operators.Freq.exactTopK(hhToks, "item", 10, 4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(naive == mg, s"MG two-pass diverged from the exact top-k")
      val vocab = hhToks.select(col("item")).distinct().count()
      val cand = graft.operators.Freq.mgCandidates(hhToks, "item", 4096)
        .count()
      println(s"SCALE topk shuffle volume: naive carries $vocab distinct " +
        s"items, MG carries $cand candidate rows (equal top-10 verified)")
    }

    // SCD2 (q194), full rebuild vs incremental apply: the batch is HALF
    // the events of 1% of users (so affected keys re-derive from a real
    // store+batch interleave — late changes exercised — while 99% of
    // keys pass through untouched). applyBatch splits the store on the
    // BATCH's key set — its cost is the affected keys' version chains
    // plus the passthrough, not a rescan-and-resort of all history.
    val evScd = spark.read.parquet(s"$sfDir/events.parquet")
      .select(explode(sequence(lit(0), lit(rep - 1))).as("r"),
        col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .select((col("r") * Off + col("event_id")).as("event_id"),
        (col("r") * Off + col("user_id")).as("user_id"),
        col("event_type"), col("ts"))
    val inBatch = pmod(col("user_id"), lit(100)) === 0 &&
      pmod(col("event_id"), lit(2)) === 0
    val scdBatch = evScd.filter(inBatch)
    val scdRest = evScd.filter(!inBatch)
    run("scd2_rebuild", graft.operators.Scd.fromHistory(
      evScd, Seq("user_id"), "ts", "event_id"), force = true)
    if (only.forall(s => s("scd2_rebuild") || s("scd2_apply_batch"))) {
      val store = graft.operators.Scd.fromHistory(
        scdRest, Seq("user_id"), "ts", "event_id").localCheckpoint(true)
      run("scd2_apply_batch", graft.operators.Scd.applyBatch(
        store, scdBatch, Seq("user_id"), "ts", "event_id"), force = true)
      val applied = graft.operators.Scd.applyBatch(
        store, scdBatch, Seq("user_id"), "ts", "event_id")
      val nApplied = applied.count()
      val nRebuilt = graft.operators.Scd.fromHistory(
        evScd, Seq("user_id"), "ts", "event_id").count()
      require(nApplied == nRebuilt,
        s"incremental SCD2 diverged: $nApplied vs $nRebuilt versions")
      println(s"SCALE scd2 incremental == rebuild ($nRebuilt versions)")
      graft.operators.Checkpoints.free(store)
    }
    // store-I/O proportionality: the bucketed store rewrites files in
    // AFFECTED buckets only, while the plain path rewrites the whole
    // store per batch whatever the batch size. Measured directly off
    // the filesystem: seed the store with everything except one small
    // key slice, then merge that slice and count which bucket dirs'
    // parquet file sets changed.
    if (only.forall(_("scd2_bucketed_io"))) {
      val base = java.nio.file.Files
        .createTempDirectory("scale_scd_bucketed").toString
      val storeDir = s"$base/store"
      val nBuckets = 64
      val tinyBatch = evScd.filter(pmod(col("user_id"), lit(1000)) === 7)
      val seed = evScd.filter(pmod(col("user_id"), lit(1000)) =!= 7)
      graft.operators.Scd.mergeBatchIntoBucketedScdStore(seed,
        Seq("user_id"), "ts", "event_id", storeDir, nBuckets)
      def filesByBucket: Map[String, Set[String]] = {
        val root = new java.io.File(storeDir)
        root.listFiles
          .filter(_.getName.startsWith(s"${graft.operators.Scd.BucketCol}="))
          .map(d => d.getName -> d.listFiles.map(_.getName)
            .filter(_.endsWith(".parquet")).toSet).toMap
      }
      val before = filesByBucket
      val affected = tinyBatch
        .select(graft.operators.Scd.bucketOf(Seq("user_id"), nBuckets))
        .distinct().count()
      val t0 = System.nanoTime()
      graft.operators.Scd.mergeBatchIntoBucketedScdStore(tinyBatch,
        Seq("user_id"), "ts", "event_id", storeDir, nBuckets)
      val sec = (System.nanoTime() - t0) / 1e9
      val after = filesByBucket
      val rewritten = before.keySet.count(d => after(d) != before(d)) +
        (after.keySet -- before.keySet).size
      require(rewritten <= affected,
        s"bucketed SCD2 rewrote $rewritten bucket dirs > $affected affected")
      val untouched = before.keySet.intersect(after.keySet)
        .count(d => after(d) == before(d))
      println(f"SCALE scd2_bucketed_io      $sec%8.2f sec  " +
        s"rewrote $rewritten/$nBuckets buckets (affected=$affected, " +
        s"untouched=$untouched) — plain path rewrites all files every batch")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }

    println("SCALE plan_checks PASS")
    // SPARK_GRAFT_SCALE_CC_PROBE=1: per-round CC cost diagnostic (the
    // former CcProbe scratch main, folded in behind this flag)
    if (sys.env.get("SPARK_GRAFT_SCALE_CC_PROBE").contains("1"))
      ccProbe(spark, docs)
    spark.stop()
  }

  /** Per-round CC loop diagnostic: mirrors the production
    * [[graft.operators.Clusters.connectedComponents]] loop (including
    * the converged-early exit and pointer-jump flattening), printing
    * edge/label counts and step wall times per round. Diagnostic only —
    * not part of the driver contract.
    */
  private def ccProbe(spark: SparkSession, docs: DataFrame): Unit = {
    import org.apache.spark.storage.StorageLevel
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val C = graft.operators.Clusters
    var e = t("candidates+e0") {
      graft.operators.Dedup.minhashCandidatesFast(
          docs, "doc_id", "text", 3, 16, 8)
        .select(col("id_a").cast("long").as("s"),
          col("id_b").cast("long").as("d"))
        .localCheckpoint()
    }
    var labels = t("labels0") { e.select(col("s").as("id"))
      .union(e.select(col("d").as("id"))).distinct()
      .withColumn("label", col("id")).localCheckpoint() }
    println(s"PROBE nodes=${labels.count()} edges=${e.count()}")
    def checksum(df: DataFrame) = df.agg(
      sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var round = 0
    var converged = false
    var sm: java.math.BigDecimal = checksum(labels)
    while (round < 25 && !converged) {
      if (round == 0) {
        val jumped = t("r0 neighbor-min") {
          C.neighborMinRound(labels, e).localCheckpoint() }
        val ns = t("r0 checksum") { checksum(jumped) }
        converged = ns == sm; sm = ns
        graft.operators.Checkpoints.free(labels); labels = jumped
      } else {
        val lv = C.relabelLive(e, labels)
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        val empty = t(s"r$round live-empty?") { lv.isEmpty }
        if (empty) {
          lv.unpersist(blocking = false)
          var flat = false
          while (!flat) {
            val jumped = t(s"r$round flatten-jump") {
              C.pointerJump(labels).localCheckpoint() }
            val ns = checksum(jumped)
            flat = ns == sm; sm = ns
            graft.operators.Checkpoints.free(labels); labels = jumped
          }
          converged = true
        } else {
          val jumped = t(s"r$round step") {
            C.liveRound(labels, lv).localCheckpoint() }
          val ns = t(s"r$round checksum") { checksum(jumped) }
          converged = ns == sm; sm = ns
          if (!converged) {
            val eNew = t(s"r$round contract") {
              C.contractLive(lv).localCheckpoint() }
            println(s"PROBE r$round survivors=${eNew.count()}")
            graft.operators.Checkpoints.free(e); e = eNew
          }
          lv.unpersist(blocking = false)
          graft.operators.Checkpoints.free(labels); labels = jumped
        }
      }
      round += 1
    }
    println(s"PROBE rounds=$round converged=$converged")
  }
}
