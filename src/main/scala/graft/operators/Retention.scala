package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retention cohort analytics (q166's operator form + its streaming
  * twin).
  *
  * The decomposition is deliberate: cohort day = a user's GLOBAL first
  * active day, and freezing that into streaming state would be wrong —
  * a late event from an earlier day (admitted by any nonzero watermark
  * delay) re-bases the user's cohort and silently invalidates every
  * offset already emitted against the old one, which append-mode output
  * cannot retract. So the streaming half maintains only the
  * MONOTONE part — the distinct (user, day) activity set, which only
  * ever grows — and the triangle (cohort assignment + offsets) is a
  * cheap batch finisher over the store, re-derived on demand with
  * whatever lateness has arrived by then. This is the same
  * incremental-store-plus-finisher shape as
  * [[Sketches.maintainDistinctSketches]].
  *
  * Scale: activity is ≤ |users|·|days| rows whatever the event volume
  * (the q166 bound); the streaming side's state is the watermark-horizon
  * slice of that set (dropDuplicatesWithinWatermark), and the finisher
  * shuffles activity rows, never raw events.
  */
object Retention {

  /** Distinct (user_id, day) activity — day = days since epoch of the
    * event's date, the q166 convention shared with the DuckDB oracle.
    */
  def activity(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events.select(col(userCol).cast("long").as("user_id"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long").as("day"))
      .distinct()

  /** Cohort triangle over an activity table: cell (cohort_day, offset) =
    * users active `offset` days after their first day, offsets 0..max.
    * Input need not be pre-distinct (the store may re-append a
    * (user, day) whose first occurrence left the stream's watermark
    * horizon) — the triangle distincts first.
    */
  def triangle(act: DataFrame, maxOffset: Int = 7): DataFrame = {
    val a = act.select(col("user_id"), col("day")).distinct()
    val cohort = a.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    a.join(cohort, Seq("user_id"))
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Streaming activity maintenance: watermark + first-occurrence dedup
    * on (user, day) within the horizon, appended to the parquet store
    * under the exactly-once batch ledger (a checkpoint-replayed batch
    * appends nothing twice). Run [[triangle]] over the store on demand.
    * Cross-horizon repeats of a (user, day) may re-append — the store
    * is an at-least-once distinct set, which [[triangle]]'s own
    * distinct absorbs.
    *
    * `wmDelay` is REQUIRED (no default): it bounds how out-of-order an
    * event may arrive across micro-batches before the watermark drops
    * it as late — a zero delay silently undercounts the store vs the
    * batch twin on any cross-batch disorder, so the caller must state
    * the lateness contract explicitly.
    */
  def maintainActivity(events: DataFrame, userCol: String, tsCol: String,
      storePath: String, ledgerDir: String, wmDelay: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    val act = events
      .select(col(userCol).cast("long").as("user_id"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long").as("day"),
        col(tsCol).as("__ts"))
      .withWatermark("__ts", wmDelay)
      .dropDuplicatesWithinWatermark("user_id", "day")
      .drop("__ts")
    graft.io.Sinks.idempotentForeachBatch(act, ledgerDir) { (b, _) =>
      b.write.mode("append").parquet(storePath)
    }
  }
}
