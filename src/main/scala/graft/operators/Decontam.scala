package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag / drop training documents that share
  * word n-grams with an evaluation set — the standard "n-gram overlap"
  * contamination check run before every large pretraining job.
  *
  * Scale design (the 100 TB story): the benchmark side is always tiny
  * (eval suites are MBs; the corpus is TBs), so its distinct shingle set
  * is BROADCAST and the corpus side joins map-side — the 100 TB never
  * shuffles to discover overlaps. The only shuffle is the per-doc overlap
  * count (keyed by doc id, uniform), and `decontaminate`'s left_anti
  * flag-join is likewise keyed by doc id. Plan-gated in ClustersSpec: the
  * executed plan must contain a BroadcastHashJoin and no SortMergeJoin
  * on the shingle key.
  */
object Decontam {

  /** Per-document overlap report against `bench`: one row per training
    * doc sharing at least one distinct word n-gram with any benchmark
    * doc — (id, n_shared, n_shingles, share ratio).
    *
    * One pass over the training corpus: each train shingle is tagged
    * hit/miss via a broadcast LEFT join against the bench set, then a
    * single per-doc aggregate computes total and shared counts together
    * — not a separate sizes aggregate joined back (which re-shingled
    * the full train side a second time: the two consumers sat under
    * different exchange subtrees, so ReuseExchange never matched).
    */
  def contaminationReport(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val trainSh = Dedup.shingleTable(train, idCol, textCol, n)
    val benchSh = Dedup.shingleTable(bench, idCol, textCol, n)
      .select("shingle").distinct().withColumn("__hit", lit(1))
    trainSh.join(broadcast(benchSh), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("n_shared"),
        count(lit(1)).as("n_shingles"))
      .filter(col("n_shared") > 0)
      .withColumn("ratio",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
  }

  /** Training rows whose shared-shingle count with `bench` is at most
    * `maxShared` (0 = strict: any overlap drops the doc).
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, maxShared: Long = 0): DataFrame = {
    val bad = contaminationReport(train, bench, idCol, textCol, n)
      .filter(col("n_shared") > maxShared)
      .select(col(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** [[contaminationReport]] for a reference set too big to broadcast —
    * cross-CORPUS overlap (which slices of corpus A reappear in corpus
    * B), where both sides are TBs and the broadcast contract breaks.
    * Same semantics, different physical plan: the reference shingle set
    * is dedup'd by its own shingle-keyed exchange, then the overlap
    * join runs as a SHUFFLED hash join on the shingle key (uniform —
    * shingles are near-unique strings), never a broadcast and never a
    * sort-merge (no order is needed; hint pinned so a misestimated
    * reference side can't flip the plan to a corpus-wide sort). Use
    * [[contaminationReport]] whenever the reference side fits a
    * broadcast — one exchange cheaper.
    */
  def contaminationReportShuffle(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val trainSh = Dedup.shingleTable(train, idCol, textCol, n)
    val benchSh = Dedup.shingleTable(bench, idCol, textCol, n)
      .select("shingle").distinct().withColumn("__hit", lit(1))
    trainSh.join(benchSh.hint("shuffle_hash"), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("n_shared"),
        count(lit(1)).as("n_shingles"))
      .filter(col("n_shared") > 0)
      .withColumn("ratio",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
  }
}
