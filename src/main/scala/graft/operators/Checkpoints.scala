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
    *
    * SHARED-LEAF HAZARD: the unpersist hits the LogicalRDD leaf, and
    * DERIVED frames share it — `free(a)` also guts `a.filter(...)`,
    * `a.join(b)`, or any other frame built FROM `a` before the call
    * (localCheckpoint truncates lineage, so the dead blocks cannot be
    * recomputed: downstream actions throw, they don't silently recompute).
    * Only call it when every consumer of the checkpointed frame — not
    * just `df` itself — is finished. The engine's internal call sites
    * ([[Clusters]]' round loop) free a leaf only after the round that
    * superseded it materialized.
    */
  def free(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }
}
