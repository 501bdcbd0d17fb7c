package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Exactly-once across restarts (SURVEY §5.2 item 4, reference
  * fault-injection pattern KeyedStateTTLDemo.java:38-40): a stateful
  * streaming aggregate stopped mid-stream and restarted against the same
  * checkpoint must neither lose nor double-count — offsets + state come
  * back from the checkpoint.
  */
class RestartSpec extends SparkSpec {
  import spark.implicits._

  test("stateful agg survives stop/restart on the same checkpoint") {
    val work = Files.createTempDirectory("graft_restart")
    val srcDir = work.resolve("src"); Files.createDirectory(srcDir)
    val ckpt = work.resolve("ckpt").toString
    val outName = "restart_out"

    // split sf0.001 events into two files = two arrival waves
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_type", $"value")
    val Array(w1, w2) = ev.randomSplit(Array(0.5, 0.5), seed = 42)
    w1.write.parquet(srcDir.resolve("wave1").toString)

    val schema = ev.schema
    def startQuery() = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
      .groupBy($"event_type").agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .writeStream.format("memory").queryName(outName)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    val q1 = startQuery()
    q1.processAllAvailable()
    val afterWave1 = spark.table(outName).as[(String, Long, Double)]
      .collect().map(r => r._1 -> r._2).toMap
    q1.stop() // "crash"

    w2.write.parquet(srcDir.resolve("wave2").toString)
    val q2 = startQuery() // restart on same checkpoint
    try {
      q2.processAllAvailable()
      val finalCounts = spark.table(outName).as[(String, Long, Double)]
        .collect().map(r => r._1 -> r._2).toMap
      val batchCounts = ev.groupBy($"event_type").agg(count(lit(1)))
        .as[(String, Long)].collect().toMap
      assert(finalCounts == batchCounts,
        s"restart lost/duplicated rows: $finalCounts vs $batchCounts")
      // and it genuinely progressed from the checkpoint, not from scratch:
      assert(afterWave1.values.sum < batchCounts.values.sum)
    } finally q2.stop()
  }

  test("sliding count window ring buffer survives stop/restart") {
    // windows straddle the crash: the kryo'd SlideBuf (count, wseq, ring)
    // must come back from the checkpoint or windowSeq/content diverge
    // from the batch oracle
    val work = Files.createTempDirectory("graft_slide_restart")
    val srcDir = work.resolve("src"); Files.createDirectory(srcDir)
    val ckpt = work.resolve("ckpt").toString
    val all = (0 until 11).map(i => KV(if (i % 3 == 0) "b" else "a", i.toLong))
    val schema = all.toDS().schema
    RestartSpec.slideResults.synchronized(RestartSpec.slideResults.clear())

    def startQuery() = {
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir.toString).as[KV]
      CountWindows.slidingStream(src)(_.k, _.v, size = 4, slide = 2)
        .map(w => (w.key, w.windowSeq, w.events.map(_.v).mkString("|")))
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[(String, Long, String)], _: Long) =>
            val rows = b.collect()
            RestartSpec.slideResults.synchronized {
              RestartSpec.slideResults ++= rows
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    all.take(6).toDS().write.parquet(srcDir.resolve("wave1").toString)
    val q1 = startQuery()
    q1.processAllAvailable()
    val afterWave1 = RestartSpec.slideResults.synchronized(RestartSpec.slideResults.size)
    q1.stop() // "crash"

    all.drop(6).toDS().write.parquet(srcDir.resolve("wave2").toString)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val got = RestartSpec.slideResults.synchronized(RestartSpec.slideResults.toSet)
      val expect = CountWindows.slidingBatch(all.toDS())(_.k, _.v, 4, 2)
        .collect().map(w => (w.key, w.windowSeq, w.events.map(_.v).mkString("|")))
        .toSet
      assert(got == expect, s"restart diverged:\n got=$got\n exp=$expect")
      assert(afterWave1 < expect.size) // it genuinely resumed, not recomputed
    } finally q2.stop()
  }

  test("CEP partials survive stop/restart: match completes across the crash") {
    import graft.streaming.Cep._
    import java.sql.Timestamp
    val work = Files.createTempDirectory("graft_cep_restart")
    val srcDir = work.resolve("src"); Files.createDirectory(srcDir)
    val ckpt = work.resolve("ckpt").toString

    def t(sec: Long) = new Timestamp(sec * 1000L)
    val pat = Pattern.begin[Login]("f1")(_.eventType == "fail")
      .next("f2")(_.eventType == "fail")
      .within(60000L)

    // wave 1: one fail for user 1 (an OPEN partial lives in state at stop)
    Seq(Login(1, "a", "fail", t(10)))
      .toDF().write.parquet(srcDir.resolve("w1").toString)

    val schema = Seq.empty[Login].toDF().schema
    // append-mode memory sink cannot recover a checkpoint; foreachBatch
    // can, collecting into a static buffer (same JVM in local mode)
    RestartSpec.cepResults.clear()
    def startQuery() = {
      val src = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(srcDir.toString)
        .withWatermark("ts", "0 seconds").as[Login]
      detectStream(src)(_.userId.toString, _.ts.getTime, pat)
        .map(r => (r.key, r.kind, r.events.size))
        .toDF("key", "kind", "n")
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = batch.collect().map(r =>
              (r.getString(0), r.getString(1), r.getInt(2)))
            RestartSpec.cepResults.synchronized {
              RestartSpec.cepResults ++= rows
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    val q1 = startQuery()
    q1.processAllAvailable()
    assert(RestartSpec.cepResults.isEmpty) // partial open, no match yet
    q1.stop() // crash with the partial in the state store

    // wave 2: the completing fail arrives after restart
    Seq(Login(1, "a", "fail", t(20)), Login(9, "z", "ok", t(100)))
      .toDF().write.parquet(srcDir.resolve("w2").toString)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val rows = RestartSpec.cepResults.toSeq
      assert(rows == Seq(("1", "match", 2)),
        s"partial lost or duplicated across restart: $rows")
    } finally q2.stop()
  }

  test("streaming near-dup claims survive stop/restart (copy after restart flagged against original claimant)") {
    val work = Files.createTempDirectory("graft_restart_dedup")
    val srcDir = work.resolve("src"); Files.createDirectory(srcDir)
    val ckpt = work.resolve("ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    // wave 1: the claimant + an unrelated doc
    Seq(Doc(1, base, t(10)),
      Doc(5, "completely different other content entirely unrelated words now", t(11)))
      .toDS().write.parquet(srcDir.resolve("w1").toString)

    val schema = implicitly[org.apache.spark.sql.Encoder[Doc]].schema
    def startQuery() = StreamDedup.nearDupCandidates(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "*.parquet")
          .option("recursiveFileLookup", "true")
          .parquet(srcDir.toString).as[Doc])(
        _.id, _.text, _.ts, horizonMs = 3600 * 1000L)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamDedup.NearDupHit], _: Long) =>
          val rows = batch.collect().map(h => (h.dupId, h.firstId))
          RestartSpec.dedupResults.synchronized {
            RestartSpec.dedupResults ++= rows
          }
          ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = startQuery()
    q1.processAllAvailable()
    assert(RestartSpec.dedupResults.isEmpty) // two distinct docs, no hits
    q1.stop() // crash with the band claims in the state store

    // wave 2: an exact copy of doc 1 arrives after the restart — the
    // claim must come back from the checkpoint, so doc 2 is flagged
    // against claimant 1 instead of silently re-claiming the bands
    Seq(Doc(2, base, t(20))).toDS()
      .write.parquet(srcDir.resolve("w2").toString)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val hits = RestartSpec.dedupResults.toSet
      assert(hits.nonEmpty && hits.forall(_ == ((2L, 1L))),
        s"claims lost or re-claimed across restart: $hits")
    } finally q2.stop()
  }

  test("txMatchStream pending sides survive stop/restart: match and timeout complete across the crash") {
    import graft.apps.{OrderEvent, ReceiptEvent, StreamingApps, TxMatchOutcome}
    val work = Files.createTempDirectory("graft_restart_tx")
    val payDir = work.resolve("pays"); Files.createDirectory(payDir)
    val rcptDir = work.resolve("receipts"); Files.createDirectory(rcptDir)
    val ckpt = work.resolve("ckpt").toString
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    // wave 1: two pays, no receipts — BOTH pending at the stop
    Seq(OrderEvent(5, "pay", "tx5", t(10)), OrderEvent(6, "pay", "tx6", t(11)))
      .toDS().write.parquet(payDir.resolve("w1").toString)
    Seq.empty[ReceiptEvent]
      .toDS().write.parquet(rcptDir.resolve("w1").toString)

    val paySchema = implicitly[org.apache.spark.sql.Encoder[OrderEvent]].schema
    val rcptSchema = implicitly[org.apache.spark.sql.Encoder[ReceiptEvent]].schema
    def startQuery() = StreamingApps.txMatchStream(
        spark.readStream.schema(paySchema)
          .option("pathGlobFilter", "*.parquet")
          .option("recursiveFileLookup", "true")
          .parquet(payDir.toString).as[OrderEvent],
        spark.readStream.schema(rcptSchema)
          .option("pathGlobFilter", "*.parquet")
          .option("recursiveFileLookup", "true")
          .parquet(rcptDir.toString).as[ReceiptEvent],
        payWaitMs = 5000L, receiptWaitMs = 3000L)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[TxMatchOutcome], _: Long) =>
          val rows = batch.collect().map(o => (o.txId, o.kind, o.orderId))
          RestartSpec.txResults.synchronized { RestartSpec.txResults ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    RestartSpec.txResults.clear()
    val q1 = startQuery()
    q1.processAllAvailable()
    assert(RestartSpec.txResults.isEmpty) // both sides pending, no output
    q1.stop() // crash with two pending pays in the state store

    // wave 2 after restart: tx5's receipt arrives (must MATCH against the
    // recovered pending pay, inside its own 3s wait of the watermark);
    // tx6 never completes and must time out as unmatched-pay once the
    // watermark passes its recovered deadline
    Seq(ReceiptEvent("tx5", "wechat", t(12)))
      .toDS().write.parquet(rcptDir.resolve("w2").toString)
    Seq(OrderEvent(9, "pay", "tx9", t(100)))
      .toDS().write.parquet(payDir.resolve("w2").toString)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val rows = RestartSpec.txResults.toSet
      assert(rows.contains(("tx5", "matched", 5L)),
        s"pending pay lost across restart (no match): $rows")
      assert(rows.contains(("tx6", "unmatched-pay", 6L)),
        s"recovered deadline did not fire: $rows")
      assert(rows.size == 2, s"unexpected extra outputs: $rows")
    } finally q2.stop()
  }
}

/** Cross-restart result collector (static: survives query restarts within
  * the test JVM).
  */
object RestartSpec {
  val cepResults = scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
  val slideResults = scala.collection.mutable.LinkedHashSet[(String, Long, String)]()
  val dedupResults = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
  val txResults = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
}
