package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) versioning — the
  * dimension-maintenance half of a corpus pipeline: document metadata,
  * user attributes, and license/source labels all change over time, and
  * joins against them must be AS-OF correct ([[Relational.asOfJoin]]
  * probes exactly the version table built here).
  *
  * A change record is (keys, attrs, ts, tie); a VERSION row is the same
  * plus `[valid_from, valid_to)` — half-open, `valid_to` NULL on the
  * current version. `(keys, ts, tie)` must uniquely identify a change
  * (an event id as the tie column does it); exact duplicate redeliveries
  * are dropped on that identity.
  *
  * Scale shape: [[fromHistory]] is ONE key-partitioned window (the
  * windows are per key — no global sort); [[applyBatch]] re-versions
  * ONLY the keys present in the batch (a broadcast-semi split of the
  * store) and unions the untouched majority back unread — incremental
  * COMPUTE is proportional to the CHANGED keys' version counts, never
  * to the stored dimension (the plain-parquet maintenance path still
  * rewrites the store's files each batch — see
  * [[mergeBatchIntoScdStore]]'s I/O caveat), and out-of-order (late)
  * changes are handled
  * exactly because affected keys re-derive from their full change set
  * rather than trusting append order.
  */
object Scd {

  /** Version table from a full change history: per key ordered by
    * (tsCol, tieCol), `valid_from` = the change's ts and `valid_to` =
    * the NEXT change's ts (NULL on the last = current version).
    *
    * NULL-keyed changes are DROPPED: a null key names no entity, and
    * keeping them would silently corrupt [[applyBatch]] — its
    * anti/semi split uses SQL equality, which never matches nulls, so
    * stored null-key versions would be passed through AND re-derived,
    * leaving overlapping "current" rows.
    */
  def fromHistory(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    changes
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .dropDuplicates(keyCols :+ tsCol :+ tieCol)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Incrementally apply a change batch to a stored version table:
    * keys untouched by the batch pass through UNREAD (broadcast
    * anti-semi split on the batch's key set — bounded, batch-sized);
    * affected keys re-derive from (their stored changes ∪ the batch),
    * which makes late and out-of-order changes exact, not approximated.
    * Law (spec-pinned): folding applyBatch over any batch split of a
    * history == [[fromHistory]] of the whole.
    */
  def applyBatch(store: DataFrame, batch: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    val keys = batch.select(keyCols.map(col): _*).distinct()
    val untouched = store.join(broadcast(keys), keyCols, "left_anti")
    val affectedChanges = store.join(broadcast(keys), keyCols, "left_semi")
      .drop("valid_from", "valid_to")
    fromHistory(affectedChanges.unionByName(batch), keyCols, tsCol, tieCol)
      .unionByName(untouched)
  }

  /** One micro-batch of version-store maintenance ([[applyBatch]] +
    * read-merge-overwrite; the merged frame is eagerly materialized
    * BEFORE the overwrite). Exposed separately from [[maintainScd2]] so
    * restart/replay semantics are directly testable — a replayed batch
    * is ALREADY a no-op by the dedup identity (its changes are in the
    * store, dropDuplicates absorbs them), but the ledger still skips
    * the wasted rewrite.
    *
    * I/O caveat: the COMPUTE is proportional to the changed keys, but
    * this plain-parquet maintenance path rewrites the WHOLE store file
    * set each batch. For an unbounded dimension with a trickle of
    * changes, store the versions key-bucket-partitioned and use dynamic
    * partition overwrite so the rewrite touches only affected buckets —
    * the operator composes unchanged; only the write mode differs.
    */
  def mergeBatchIntoScdStore(batch: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, storePath: String): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(p))
        applyBatch(spark.read.parquet(storePath), batch, keyCols, tsCol, tieCol)
      else fromHistory(batch, keyCols, tsCol, tieCol)
    val pinned = merged.localCheckpoint(true)
    pinned.write.mode("overwrite").parquet(storePath)
    Checkpoints.free(pinned)
  }

  /** Streaming SCD2 maintenance: every micro-batch of change records is
    * applied to the parquet version store under the exactly-once batch
    * ledger. The live store serves [[Relational.asOfJoin]] probes and
    * `valid_to IS NULL` current-dimension reads at any time.
    */
  def maintainScd2(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, storePath: String, ledgerDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
      org.apache.spark.sql.Row] =
    graft.io.Sinks.idempotentForeachBatch(stream, ledgerDir) { (b, _) =>
      mergeBatchIntoScdStore(b, keyCols, tsCol, tieCol, storePath)
    }
}
