package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Changelog semantics — the reference's Table↔stream dualities that
  * Spark's output modes don't expose directly (SURVEY §7 hard parts a/b):
  *
  *  - true retract pairs (reference toRetractStream,
  *    cn/ngt/day10/_02_StreamToTable_Agg.java:48,55-64: a re-aggregated
  *    key emits `(false, old)` then `(true, new)`),
  *  - first/update emission tagging for re-fired windows under
  *    allowedLateness (reference _08_lateReadingsOutput.scala:118-135).
  *
  * Both are built on foreachBatch diffing against the previous snapshot of
  * the aggregate — the snapshot is keyed state the engine already shuffles
  * by the group key, so the diff join is co-partitioned.
  *
  * ENTRY POINT: [[retractStreamPersisted]] is the retract-stream API —
  * distributed diff, restart-safe snapshot, state off the driver heap.
  * [[retractStream]] is test scaffolding only (driver-side map; OOMs at
  * real key cardinality and forgets its snapshot on restart).
  */
object Changelog {

  /** One changelog row: add=true is an insert/new value, add=false a
    * retraction of the previous value (the reference's Tuple2[Boolean, Row]).
    */
  case class Change(add: Boolean, key: String, value: Long, batchId: Long)

  /** Attach a retract-pair consumer to an update-mode aggregate stream.
    * `keyCol`/`valueCol` name the group key and aggregate value; `sink`
    * receives the full (false,old)/(true,new) sequence per micro-batch.
    *
    * Test/dev form ONLY: the snapshot is a driver-side map held in this
    * closure, so it (a) grows with key cardinality and (b) resets if the
    * query restarts from checkpoint — a restarted query re-emits inserts
    * without retractions and re-tags keys "first". Production queries must
    * use [[retractStreamPersisted]], which keeps the snapshot in a keyed
    * parquet state table that survives restarts and diffs distributed.
    */
  def retractStream(updates: DataFrame, keyCol: String, valueCol: String,
      sink: Seq[Change] => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    val snapshot = scala.collection.mutable.Map[String, Long]()
    updates.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, id: Long) =>
        val rows = batch.select(col(keyCol).cast("string"), col(valueCol).cast("long"))
          .collect().map(r => r.getString(0) -> r.getLong(1))
        val changes = rows.flatMap { case (k, v) =>
          val old = snapshot.get(k)
          snapshot(k) = v
          old match {
            case Some(o) if o == v => Nil
            case Some(o) => Seq(Change(add = false, k, o, id), Change(add = true, k, v, id))
            case None => Seq(Change(add = true, k, v, id))
          }
        }
        if (changes.nonEmpty) sink(changes.toSeq)
        ()
    }
  }

  /** At-scale retract stream: the previous-aggregate snapshot persists as
    * a versioned keyed parquet table under `stateDir` (one version per
    * micro-batch, previous version retained), so it survives query
    * restarts from checkpoint; a replayed micro-batch diffs against the
    * same prior snapshot and re-emits identical changes (idempotent). The
    * diff is a distributed join on the group key — nothing is collected to
    * the driver, state scales with the cluster, not the driver heap.
    *
    * `sink` receives a changes DataFrame (add BOOLEAN, key STRING,
    * value BIGINT, batchId BIGINT) per micro-batch.
    */
  def retractStreamPersisted(updates: DataFrame, keyCol: String, valueCol: String,
      stateDir: String, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    updates.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val base = new org.apache.hadoop.fs.Path(stateDir)
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val versions =
          if (fs.exists(base))
            fs.listStatus(base).map(_.getPath.getName)
              .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
              .filter(_ < id).sorted
          else Array.empty[Long]
        val cur = batch
          .select(col(keyCol).cast("string").as("k"), col(valueCol).cast("long").as("v"))
          .dropDuplicates("k").persist()
        try {
          val prev = versions.lastOption match {
            case Some(vid) => spark.read.parquet(s"$stateDir/v$vid")
              .select(col("k"), col("v").as("old"))
            case None => cur.filter(lit(false)).select(col("k"), col("v").as("old"))
          }
          val diff = cur.join(prev, Seq("k"), "left_outer")
            .filter(col("old").isNull || col("old") =!= col("v")).persist()
          val changes = diff.filter(col("old").isNotNull)
            .select(lit(false).as("add"), col("k").as("key"),
              col("old").as("value"), lit(id).as("batchId"))
            .unionByName(diff.select(lit(true).as("add"), col("k").as("key"),
              col("v").as("value"), lit(id).as("batchId")))
          sink(changes, id)
          // upsert: previous snapshot minus updated keys, plus this batch
          val snap = prev.join(cur, Seq("k"), "left_anti")
            .select(col("k"), col("old").as("v")).unionByName(cur)
          snap.write.mode("overwrite").parquet(s"$stateDir/v$id")
          diff.unpersist()
          // keep only the latest prior version for replay-after-restart
          versions.dropRight(1).foreach(vid =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v$vid"), true))
        } finally cur.unpersist()
        ()
    }
  }

  /** Tag each emitted window row "first" or "update" (late re-fires) —
    * the reference's allowedLateness tagging. Works on any update-mode
    * aggregate whose key is `keyCols`. Same driver-form restriction as
    * [[retractStream]]: the `seen` set resets on restart-from-checkpoint
    * and grows with key cardinality on the driver heap — test/dev form
    * ONLY. Production queries use [[tagEmissionsPersisted]].
    */
  case class Tagged(key: String, value: Long, tag: String, batchId: Long)

  def tagEmissions(updates: DataFrame, keyCols: Seq[String], valueCol: String,
      sink: Seq[Tagged] => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    val seen = scala.collection.mutable.Set[String]()
    updates.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, id: Long) =>
        val keyed = batch.select(
          concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("k"),
          col(valueCol).cast("long").as("v")).collect()
        val tagged = keyed.map { r =>
          val k = r.getString(0)
          val tag = if (seen.add(k)) "first" else "update"
          Tagged(k, r.getLong(1), tag, id)
        }
        if (tagged.nonEmpty) sink(tagged.toSeq)
        ()
    }
  }

  /** At-scale emission tagging: the seen-keys set persists as a
    * versioned keyed parquet table under `stateDir` (the
    * [[retractStreamPersisted]] machinery with value-less state), so a
    * query restarted from checkpoint keeps tagging previously-seen keys
    * "update" instead of amnesiac "first", and a replayed micro-batch
    * re-tags against the same prior snapshot (idempotent). The
    * first/update classification is a distributed left-outer join on the
    * key — nothing is collected to the driver.
    *
    * `sink` receives a DataFrame (key STRING, value BIGINT, tag STRING,
    * batchId BIGINT) per micro-batch.
    */
  def tagEmissionsPersisted(updates: DataFrame, keyCols: Seq[String],
      valueCol: String, stateDir: String, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    updates.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val base = new org.apache.hadoop.fs.Path(stateDir)
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val versions =
          if (fs.exists(base))
            fs.listStatus(base).map(_.getPath.getName)
              .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
              .filter(_ < id).sorted
          else Array.empty[Long]
        val cur = batch.select(
          concat_ws("|", keyCols.map(c => col(c).cast("string")): _*).as("k"),
          col(valueCol).cast("long").as("v"))
          .dropDuplicates("k").persist()
        try {
          val prev = versions.lastOption match {
            case Some(vid) => spark.read.parquet(s"$stateDir/v$vid")
            case None => cur.filter(lit(false)).select(col("k"))
          }
          val tagged = cur.join(prev.withColumn("__seen", lit(true)),
              Seq("k"), "left_outer")
            .select(col("k").as("key"), col("v").as("value"),
              when(col("__seen").isNotNull, "update").otherwise("first").as("tag"),
              lit(id).as("batchId"))
          sink(tagged, id)
          prev.select("k").unionByName(cur.select("k")).distinct()
            .write.mode("overwrite").parquet(s"$stateDir/v$id")
          versions.dropRight(1).foreach(vid =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v$vid"), true))
        } finally cur.unpersist()
        ()
    }
  }

  /** Bounded iteration (reference iterate/closeWith,
    * java/.../transformation/IterateDemo.java:22-50): streaming feedback
    * loops don't exist in Structured Streaming, so iteration is a driver
    * loop over batch Datasets — `step` advances, `continueCond` selects
    * rows that feed back; rows leaving the loop accumulate in the result.
    */
  def iterateBatch[T](ds: Dataset[T], step: Dataset[T] => Dataset[T],
      continueCond: Dataset[T] => (Dataset[T], Dataset[T]),
      maxIter: Int): Dataset[T] = {
    var current = ds
    var out: Option[Dataset[T]] = None
    var i = 0
    while (i < maxIter && !current.isEmpty) {
      val stepped = step(current)
      val (feedback, emitted) = continueCond(stepped)
      out = Some(out.map(_.union(emitted)).getOrElse(emitted))
      current = feedback.localCheckpoint() // truncate the growing lineage
      i += 1
    }
    out.getOrElse(ds.sparkSession.emptyDataset(ds.encoder))
  }
}
