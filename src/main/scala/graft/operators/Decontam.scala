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
    */
  def contaminationReport(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val trainSh = Dedup.shingleTable(train, idCol, textCol, n)
    val benchSh = Dedup.shingleTable(bench, idCol, textCol, n)
      .select("shingle").distinct()
    val sizes = trainSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    trainSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
      .join(sizes, Seq(idCol))
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
}
