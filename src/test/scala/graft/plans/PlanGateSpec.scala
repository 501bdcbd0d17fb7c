package graft.plans

import graft.{SparkEntry, SparkSpec}

/** The 100 TB plan-shape gate over EVERY gate query (not just the corpus
  * operators ScaleSmoke exercises): each `SparkEntry.queries` entry runs
  * at sf0.001 and its EXECUTED plan must carry no CartesianProduct, no
  * BroadcastNestedLoopJoin outside the designed-broadcast allowlist, and
  * no partitionless WindowExec over unaggregated rows. This converts the
  * ScaleSmoke shape contract into a regression test: a future query that
  * ships a single-task window or an accidental cross join fails
  * `sbt test`, not a 100 TB run.
  */
class PlanGateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * every entry broadcasts a side that is SMALL BY CONSTRUCTION
    * (a bounded query batch, k centroids, a 1-row corpus-stats frame, a
    * benchmark slice) against the corpus scan — the designed ANN /
    * scoring shape, not an accident. Anything not listed here must plan
    * hash or sort-merge joins only.
    */
  private val allowBnlj: Set[String] = Set(
    "q26_ann_topk",        // 50-query batch broadcast vs corpus
    "q27_embedding_neardup", // bounded candidate batch broadcast
    "q42_lsh_ann",         // query batch broadcast into probed buckets
    "q53_late_tag",        // 1-row max-event-time frame broadcast (tagLate)
    "q60_ivf_ann",         // query batch + nlist centroids broadcast
    "q78_pq_ann",          // query batch + codebooks broadcast
    "q79_pq_rerank",       // shortlist rerank: query batch broadcast
    "q81_decontam",        // benchmark slice broadcast vs corpus
    "q84_bm25",            // query terms + corpus stats (1 row) broadcast
    "q85_semantic_dedup",  // bounded embedding-pair candidates
    "q87_unigram_logprob", // 1-row total-token stats broadcast
    "q92_curation_pipeline", // composes unigram scoring above
    "q94_quality_band",    // per-band totals (bounded) broadcast
    "q96_tfidf_terms",     // 1-row doc-count stats broadcast
    "q98_rp_rerank",       // query batch broadcast (RP shortlist + rerank)
    "q99_token_budget",    // bounded band-totals broadcast
    "q102_kmeans",         // k centroids broadcast in argmin assignment
    "q103_cluster_sample"  // k centroids + per-cluster quotas broadcast
  )

  test("allowBnlj names real queries") {
    val unknown = allowBnlj -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"allowlist names no such query: $unknown")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executed plan passes the scale-shape gate") {
      val df = fn(spark, dir)
      df.count() // materialize so AQE's final executed plan is inspected
      PlanWalk.assertShapes(name, df.queryExecution.executedPlan,
        allowBroadcastNlj = allowBnlj(name))
    }
  }
}
