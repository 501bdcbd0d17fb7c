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
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val splits = {
      val files = df.inputFiles.length
      if (files > 0) files else df.rdd.getNumPartitions
    }
    if (splits < p) df.repartition(2 * p) else df
  }
}
