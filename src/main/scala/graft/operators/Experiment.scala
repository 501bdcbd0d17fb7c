package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment reporting (q176's operator form + its streaming
  * twin).
  *
  * Lambda decomposition (the [[Retention]]/[[Anomaly]] discipline): the
  * streaming half maintains one |users|-bounded store of per-user CRDT
  * aggregates — the MIN first-signup record and the MAX purchase time —
  * and the report is a batch finisher over the store. Min and max are
  * commutative and late-event-proof: a late EARLIER signup re-bases the
  * user's assignment (variant and s_ts both change), which frozen
  * append-mode assignment state could never retract but a min-merge
  * store absorbs by construction; a late purchase can only raise p_max,
  * and `converted = p_max > s_ts` is exactly "some purchase strictly
  * after the first signup" without storing any purchase list.
  *
  * Scale: the store is ≤ |users| rows whatever the event volume; each
  * micro-batch pays one map-side-combined user aggregate plus a
  * store-sized min/max merge; the finisher reduces store rows to
  * |variants| rows.
  */
object Experiment {

  /** Per-user CRDT aggregates from a raw event set: `f` = the user's
    * minimum (ts, event_id, props) signup struct — event_id is unique,
    * so the props tail never decides the min — and `p_ts` = the
    * maximum purchase time. Either side may be null; rows with neither
    * never form (both-null users are filtered, they carry no evidence).
    */
  def userAggregates(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, propsCol: String): DataFrame =
    events
      .filter(col(typeCol).isin("signup", "purchase"))
      .groupBy(col(userCol).as("user_id"))
      .agg(
        min(when(col(typeCol) === "signup",
          struct(col(tsCol).as("ts"), col(idCol).as("event_id"),
            col(propsCol).as("props")))).as("f"),
        max(when(col(typeCol) === "purchase", col(tsCol))).as("p_ts"))

  /** Merge two per-user aggregate tables (the stored state + a new
    * batch's own aggregates): min of the signup structs, max of the
    * purchase times — both null-skipping, so one-sided users merge
    * correctly.
    */
  def mergeUserAggregates(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("user_id"), col("f"), col("p_ts"))
      .unionByName(b.select(col("user_id"), col("f"), col("p_ts")))
      .groupBy(col("user_id"))
      .agg(min(col("f")).as("f"), max(col("p_ts")).as("p_ts"))

  /** The report finisher over a per-user aggregate table (batch-built
    * or the maintained store): variant = parity of the numeric prop on
    * the first signup; converted = some purchase strictly after it;
    * per variant, users / conversions / the exact micro-unit rate
    * (BIGINT floor division — Column `/` is double division).
    */
  def abReport(userAgg: DataFrame): DataFrame = {
    val a = col("n_converted") * 1000000L
    userAgg.filter(col("f").isNotNull)
      .select(
        (regexp_extract(col("f.props"), "([0-9]+)", 1).cast("long") % 2)
          .as("variant"),
        when(col("p_ts").isNotNull && col("p_ts") > col("f.ts"), 1L)
          .otherwise(0L).as("converted"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_converted"))
      .withColumn("conv_micro",
        floor((a - pmod(a, col("n_users"))).cast("double") /
          col("n_users").cast("double") + 0.5).cast("long"))
      .orderBy(col("variant"))
  }

  /** One micro-batch of assignment/conversion-store maintenance: the
    * batch's own per-user aggregates merged into the parquet store
    * (read-merge-overwrite over ≤ |users| rows, eagerly materialized
    * before the overwrite).
    */
  def mergeAggregatesIntoStore(batch: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String, propsCol: String,
      storePath: String): Unit = {
    val spark = batch.sparkSession
    val newAgg = userAggregates(batch, userCol, typeCol, tsCol, idCol,
      propsCol)
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(p))
        mergeUserAggregates(spark.read.parquet(storePath), newAgg)
      else newAgg
    val pinned = merged.localCheckpoint(true)
    pinned.write.mode("overwrite").parquet(storePath)
    Checkpoints.free(pinned)
  }

  /** Streaming maintenance of the per-user experiment store under the
    * exactly-once batch ledger (min/max merges are naturally
    * idempotent, but the ledger keeps replay semantics uniform across
    * every maintained store and shields a future non-idempotent column).
    * Run [[abReport]] over the store on demand. No watermark parameter:
    * min/max merges admit unbounded lateness by construction.
    */
  def maintainUserAggregates(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String, propsCol: String,
      storePath: String, ledgerDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    graft.io.Sinks.idempotentForeachBatch(events, ledgerDir) { (b, _) =>
      mergeAggregatesIntoStore(b, userCol, typeCol, tsCol, idCol,
        propsCol, storePath)
    }
}
