package graft.operators

import org.apache.spark.sql.DataFrame

/** The shared scan-parallelism guard (the `Retrieval.buildIndex`
  * discipline): if the input arrives in fewer splits than the session
  * has cores — the local single-file fixture — spread it so the
  * pre-shuffle per-doc CPU (tokenize / hash / rebuild) parallelizes. A
  * real corpus lands in thousands of splits, making this a no-op.
  *
  * Split detection prefers `inputFiles` (plan metadata, no job and no
  * RDD materialization — the round-10 note against calling
  * `df.rdd.getNumPartitions` per invocation, which forces a physical
  * conversion twice per caller); frames with no file scan (tests,
  * synthesized corpora) fall back to the RDD partition count.
  */
private[graft] object Respread {
  def apply(df: DataFrame): DataFrame = spread(df, 2)

  /** Core-count-width variant for passes whose per-row CPU is heavy but
    * short (the md5 signature tiers): round-18 measurement — width p
    * cut the single-split md5 passes 2–7x (q63 2.1→0.3 s, q65's
    * candidate pass 1.7→0.9 s at sf0.1) while the stock 2p width LOST
    * time on the same passes (per-task fixed cost exceeded the ~30 ms
    * of hashing each sliver carried). Same no-op-at-scale contract.
    */
  def cores(df: DataFrame): DataFrame = spread(df, 1)

  private def spread(df: DataFrame, mult: Int): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val splits = {
      val files = df.inputFiles.length
      if (files > 0) files else df.rdd.getNumPartitions
    }
    if (splits < p) df.repartition(mult * p) else df
  }
}
