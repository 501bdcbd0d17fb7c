package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic release for eagerly-localCheckpoint'd frames.
  *
  * Operators that materialize an intermediate via `localCheckpoint()`
  * ([[Dedup.pairJaccard]]'s candidate set, [[Clusters]]' label rounds)
  * pin block-manager storage that is otherwise freed only when the
  * returned frame is GC'd and the ContextCleaner runs. Long-lived
  * sessions (benchmarks, notebooks) can call [[free]] after consuming
  * the result to drop those blocks NOW instead.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD(s) backing `df` (best-effort: the
    * checkpoint lives in a LogicalRDD leaf; `df.unpersist()` cannot
    * reach it). Safe on frames with no checkpoint — a no-op. After the
    * call the frame must not be re-used (its backing blocks are gone).
    */
  def free(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }
}
