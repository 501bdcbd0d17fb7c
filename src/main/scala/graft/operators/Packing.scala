package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: lay documents head-to-tail
  * in a deterministic order and cut the concatenated token stream into
  * fixed-budget training sequences ("concat-and-chunk" — the packing used
  * by most large pretraining runs; no bin-packing search, deterministic,
  * and every token is used exactly once).
  *
  * The core primitive is a DISTRIBUTED prefix sum. The naive form —
  * `sum(tokens).over(Window.orderBy(id))` — has no partition key, so Spark
  * funnels the entire corpus through ONE task (the same scale-killer the
  * IVF centroid pick had). Here the scan is two-level:
  *
  *  1. bucket rows by `floor(order / bucketWidth)` and cumsum WITHIN each
  *     bucket (window partitioned by bucket — distributed);
  *  2. aggregate one total per bucket, prefix-sum the bucket totals
  *     (a window over |buckets| = n/bucketWidth ROWS, i.e. the reduced
  *     table, not the corpus), and broadcast-join the per-bucket offsets
  *     back.
  *
  * Final cumsum = bucket offset + within-bucket cumsum. At 10^11 docs and
  * bucketWidth 2^16 the bucket-totals table is ~1.5M rows of (bucket,
  * total) — the one partitionless window touches megabytes, not the
  * corpus, and the pattern recurses if that ever grows past memory.
  */
object Packing {

  /** Exact running total of `valueCol` over ascending `orderCol` (a
    * numeric, unique key — e.g. a dense doc id), distributed via the
    * two-level bucket scan above. Adds `outCol` (long); requires
    * non-negative order values.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "cumsum", bucketWidth: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val bucketed = df.withColumn("__b",
      (col(orderCol).cast("long") / bucketWidth).cast("long"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col(orderCol))
    val within = bucketed.withColumn("__cs",
      sum(col(valueCol).cast("long")).over(wIn))
    // one row per bucket; the unpartitioned window below runs over this
    // REDUCED table only (n / bucketWidth rows)
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__b"))
      .agg(sum(col(valueCol).cast("long")).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    within.join(broadcast(offsets), Seq("__b"))
      .withColumn(outCol, col("__cs") + col("__off"))
      .drop("__b", "__cs", "__off")
  }

  /** Concat-and-chunk packing: every document gets its half-open token
    * span [start_off, end_off) in the concatenated stream and the range
    * of `budget`-token packs it lands in. A document crossing a pack
    * boundary is split across `n_packs` sequences (standard: attention
    * masks handle the seam downstream; no token is padded or dropped).
    *
    * Output adds: start_off, end_off, pack_first, pack_last, n_packs.
    * All integer arithmetic — reproducible on any engine.
    */
  def packByBudget(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, bucketWidth: Long = 1L << 16): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    prefixSum(df, orderCol, tokenCol, "end_off", bucketWidth)
      .withColumn("start_off", col("end_off") - col(tokenCol).cast("long"))
      .withColumn("pack_first", expr(s"start_off div $budget"))
      .withColumn("pack_last",
        when(col(tokenCol) > 0, expr(s"(end_off - 1) div $budget"))
          .otherwise(expr(s"start_off div $budget")))
      .withColumn("n_packs", col("pack_last") - col("pack_first") + lit(1L))
  }

  /** Per-pack roll-up of [[packByBudget]] output: how many documents
    * START in each pack and how many cross its boundary — the
    * packing-quality numbers a pipeline dashboards (seam fraction rises
    * as the budget shrinks relative to doc length). Reads the pack
    * columns the packing step emitted, so there is no budget parameter
    * to get out of sync with it.
    */
  def packSummary(packed: DataFrame): DataFrame = {
    packed
      .groupBy(col("pack_first").as("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_packs") - lit(1L)).as("n_boundary_crossings"),
        min(col("start_off")).as("first_off"),
        max(col("end_off")).as("last_off"))
  }

  /** Length-bucketed dynamic batching — the pad-to-longest alternative
    * to concat-and-chunk packing: docs group into token-length buckets
    * of width `bucketTokens`, each bucket emits batches of `batchSize`
    * docs in deterministic id order, so batch peers differ by less than
    * one bucket width and per-batch padding waste is bounded by
    * batchSize·(bucketTokens-1) tokens. All-integer arithmetic.
    *
    * Scale: one shuffle keyed by the bucket; the rank window partitions
    * by bucket. Length distributions concentrate, so a hot bucket can
    * dominate — at extreme scale pre-split hot buckets with a hash
    * sub-shard ([[Sampling.deterministicShuffle]]) and key the window by
    * (bucket, shard); batches never need to cross shards.
    *
    * `idCol` must be unique and non-null (the [[prefixSum]] order-key
    * rule): duplicate ids would make batch assignment scan-order
    * dependent.
    */
  def lengthBatches(df: DataFrame, idCol: String, tokenCol: String,
      bucketTokens: Int, batchSize: Int): DataFrame = {
    require(bucketTokens > 0 && batchSize > 0,
      s"positive bucketTokens/batchSize required: $bucketTokens/$batchSize")
    Seq("bucket", "batch_id", "__rn").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    df.withColumn("bucket",
        expr(s"CAST($tokenCol AS BIGINT) div $bucketTokens"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col(idCol))))
      .withColumn("batch_id",
        expr(s"CAST(__rn - 1 AS BIGINT) div $batchSize"))
      .drop("__rn")
  }
}
