package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Reading(id: String, ts: Timestamp, temp: Double)

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("max watermark policy lets an idle source stop holding windows open (withIdleness analog)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    StreamOps.setMultipleWatermarkPolicy(spark, "max")
    try {
      val live = MemoryStream[Reading]
      val idle = MemoryStream[Reading] // never receives data
      val union = live.toDF().withWatermark("ts", "0 seconds")
        .unionByName(idle.toDF().withWatermark("ts", "0 seconds"))
      val agg = union.groupBy(window($"ts", "5 seconds"), $"id")
        .agg(count(lit(1)).as("n"))
        .select($"id", $"window.start".cast("long").as("ws"), $"n")
      val q = agg.writeStream.format("memory").queryName("idle_out")
        .outputMode("append").start()
      try {
        live.addData(Reading("a", t(1), 1), Reading("a", t(3), 3))
        q.processAllAvailable()
        live.addData(Reading("a", t(9), 9)) // live watermark -> 9s
        q.processAllAvailable()
        // under the default "min" policy the idle source pins the global
        // watermark at 0 and [0,5) never closes; "max" follows the live one
        val rows = spark.table("idle_out").as[(String, Long, Long)].collect()
        assert(rows.toSet == Set(("a", 0L, 2L)),
          s"window [0,5) should close under max policy, got ${rows.toSeq}")
      } finally q.stop()
    } finally StreamOps.setMultipleWatermarkPolicy(spark, "min")
  }

  test("early-fire window count: early previews per batch, FIRE_AND_PURGE on close") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val src = ms.toDS().withWatermark("ts", "0 seconds").as[Reading]
    val out = StreamOps.earlyFinalWindowCount(src)(_.id, _.ts.getTime, 10000L)
    val q = out.writeStream.format("memory").queryName("ef_out")
      .outputMode("append").start()
    try {
      ms.addData(Reading("a", t(1), 0), Reading("a", t(2), 0))
      q.processAllAvailable()
      ms.addData(Reading("a", t(4), 0)) // same window, next batch
      q.processAllAvailable()
      val early = spark.table("ef_out").as[StreamOps.WinFire].collect()
      // two early previews for window [0,10s): 2 then 3
      assert(early.filter(_.kind == "early").map(_.cnt).sorted.toSeq == Seq(2L, 3L))
      assert(!early.exists(_.kind == "final"))
      ms.addData(Reading("a", t(15), 0)) // watermark -> 15s: closes [0,10)
      q.processAllAvailable()
      ms.addData(Reading("a", t(16), 0)) // next batch processes the timer
      q.processAllAvailable()
      val fires = spark.table("ef_out").as[StreamOps.WinFire].collect()
      val finals = fires.filter(f => f.kind == "final" && f.windowStart == 0L)
      assert(finals.length == 1 && finals.head.cnt == 3L,
        s"expected one final(cnt=3) for [0,10s), got ${fires.toSeq}")
      // purge: only the open [10,20s) window may hold state
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 1, s"closed-window state not purged: $stateRows")
    } finally q.stop()
  }

  test("queryable state: the view serves the latest per-key state after each batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val agg = ms.toDF().groupBy($"id").agg(count(lit(1)).as("n"),
      sum($"temp").as("total"))
    val q = StreamOps.queryableStateView(agg, "qs_state")
    try {
      ms.addData(Reading("a", t(1), 10), Reading("a", t(2), 5), Reading("b", t(3), 1))
      q.processAllAvailable()
      def get(id: String) = spark.table("qs_state").filter($"id" === id)
        .as[(String, Long, Double)].collect().headOption
      assert(get("a").contains(("a", 2L, 15.0)))   // point query
      assert(get("b").contains(("b", 1L, 1.0)))
      ms.addData(Reading("a", t(9), 100))
      q.processAllAvailable()
      assert(get("a").contains(("a", 3L, 115.0)))  // state advanced
      assert(get("b").contains(("b", 1L, 1.0)))    // untouched key retained
    } finally q.stop()
  }

  test("streaming tumbling window agg closes on watermark (EvenTimeTumblingWindowDemo golden shape)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val agg = StreamOps.windowedAgg(ms.toDF(), "ts", "0 seconds", "5 seconds",
      None, Seq(col("id")), Seq(count(lit(1)).as("n"), sum(col("temp")).as("s")))
      .select(col("id"), col("window.start").cast("long").as("ws"), col("n"), col("s"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      ms.addData(Reading("a", t(1), 1), Reading("a", t(2), 2), Reading("a", t(4), 4))
      q.processAllAvailable()
      ms.addData(Reading("a", t(7), 7)) // watermark -> 7s, closes [0,5)
      q.processAllAvailable()
      val rows = spark.table("win_out").as[(String, Long, Long, Double)].collect()
      assert(rows.toSet == Set(("a", 0L, 3L, 7.0)))
      ms.addData(Reading("a", t(12), 1)) // closes [5,10)
      q.processAllAvailable()
      assert(spark.table("win_out").count() == 2)
    } finally q.stop()
  }

  test("late rows are dropped by watermark; tagLate splits them upstream") {
    // batch analog of sideOutputLateData: max ts 100, delay 5s -> ts<95 late
    val df = Seq(("a", t(100)), ("a", t(97)), ("a", t(10))).toDF("id", "ts")
    val tagged = StreamOps.tagLate(df, "ts", "5 SECONDS")
    val late = tagged.filter(col("is_late")).select("id", "ts").as[(String, Timestamp)].collect()
    assert(late.map(_._2.getTime).toSeq == Seq(10000L))
  }

  test("side-output split routes rows by predicate") {
    val df = Seq(1, 2, 3, 4, 5, 6).toDF("v")
    val parts = StreamOps.split(df, Map(
      "even" -> (col("v") % 2 === 0), "big" -> (col("v") > 4)))
    assert(parts("even").as[Int].collect().sorted.toSeq == Seq(2, 4, 6))
    assert(parts("big").as[Int].collect().sorted.toSeq == Seq(5, 6))
  }

  test("running aggregate with TTL emits per-batch updates (update mode)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KV]
    val out = StreamOps.runningAggregateWithTtl[KV, Long](ms.toDS())(
        _.k, 0L, (acc, e) => acc + e.v, ttlMs = 0L)
      .map(kv => (kv.key, kv.value, kv.expired))
    val q = out.writeStream.format("memory").queryName("run_out")
      .outputMode("update").start()
    try {
      ms.addData(KV("a", 5), KV("a", 7), KV("b", 1)); q.processAllAvailable()
      ms.addData(KV("a", 8)); q.processAllAvailable()
      val rows = spark.table("run_out").as[(String, Long, Boolean)].collect().toSet
      // reference retract-stream semantics at micro-batch granularity:
      // a:12 then a:20 (amended), b:1
      assert(rows == Set(("a", 12L, false), ("a", 20L, false), ("b", 1L, false)))
    } finally q.stop()
  }

  test("control-stream gating forwards data only while the gate is open") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = MemoryStream[Reading]
    val ctrl = MemoryStream[StreamOps.GateControl]
    val out = StreamOps.gateByControl[Reading](
        data.toDS(), _.id, _.ts.getTime, ctrl.toDS())
      .map(r => (r.id, r.ts.getTime / 1000))
    val q = out.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      ctrl.addData(StreamOps.GateControl("a", 10000L, 5000L)) // open [10s,15s)
      data.addData(Reading("a", t(12), 1),  // inside gate -> forwarded
        Reading("a", t(16), 2),             // after gate closed -> dropped
        Reading("b", t(12), 3))             // no gate for b -> dropped
      q.processAllAvailable()
      val rows = spark.table("gate_out").as[(String, Long)].collect().toSet
      assert(rows == Set(("a", 12L)))
      ctrl.addData(StreamOps.GateControl("a", 20000L, 5000L)) // reopen
      data.addData(Reading("a", t(21), 4))
      q.processAllAvailable()
      assert(spark.table("gate_out").count() == 2)
    } finally q.stop()
  }

  test("streaming side outputs: one source read, n tagged sinks per batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KV]
    val hot = scala.collection.mutable.ArrayBuffer[String]()
    val cold = scala.collection.mutable.ArrayBuffer[String]()
    val q = StreamOps.sideOutputs(ms.toDF(),
      Map("hot" -> (col("v") >= 10), "cold" -> (col("v") < 10)),
      Map(
        "hot" -> ((df, _) => hot.synchronized {
          hot ++= df.collect().map(_.getString(0)) }),
        "cold" -> ((df, _) => cold.synchronized {
          cold ++= df.collect().map(_.getString(0)) })))
      .start()
    try {
      ms.addData(KV("a", 15), KV("b", 3), KV("c", 20)); q.processAllAvailable()
      assert(hot.sorted.toSeq == Seq("a", "c"))
      assert(cold.toSeq == Seq("b"))
    } finally q.stop()
  }

  test("observe() metrics surface per-batch aggregates in query progress") {
    // in-stream metrics without a second aggregation pass — the ops
    // counterpart of the reference's per-operator counters
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KV]
    val observed = ms.toDF()
      .observe("m", count(lit(1)).as("rows"), sum($"v").as("vsum"))
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      ms.addData(KV("a", 5), KV("b", 7)); q.processAllAvailable()
      val m = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("m"))).lastOption
      assert(m.exists(r => r.getLong(0) == 2L && r.getLong(1) == 12L),
        s"observed metrics missing/wrong: $m")
    } finally q.stop()
  }

  test("late rows dropped by watermark are observable in query progress") {
    // Spark drops late rows silently inside the stateful operator; the
    // operational signal is stateOperators.numRowsDroppedByWatermark —
    // the engine's replacement for the reference's late-data side output
    // counter (WindowLateDateDemo).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val agg = ms.toDF().withWatermark("ts", "5 seconds")
      .groupBy(window($"ts", "10 seconds"), $"id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_obs")
      .outputMode("append").start()
    try {
      ms.addData(Reading("a", t(100), 0)); q.processAllAvailable() // wm -> 95s
      ms.addData(Reading("a", t(50), 0));  q.processAllAvailable() // late: dropped
      val dropped = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1, s"expected a watermark-dropped row, got $dropped")
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark bounds state") {
    // the streaming form of exact dedup (reference UV/dedup story): state
    // holds only keys younger than the watermark delay, so it is bounded
    // at 100 TB — unlike dropDuplicates on a stream, which keeps all keys
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val deduped = ms.toDF().withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
      .select($"id", $"ts".cast("long").as("sec"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(Reading("a", t(1), 0), Reading("a", t(2), 0), Reading("b", t(3), 0))
      q.processAllAvailable()
      ms.addData(Reading("a", t(4), 0)) // still within watermark: duplicate
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[(String, Long)].collect()
      assert(rows.map(_._1).sorted.toSeq == Seq("a", "b")) // one 'a', one 'b'
    } finally q.stop()
  }

  test("streaming top-N ranks each window once, when the watermark closes it") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Int)]()
    val q = StreamOps.streamingTopN(ms.toDF(), "ts", "0 seconds",
        "10 seconds", "id", n = 2,
        (ranked, _) => got.synchronized {
          got ++= ranked.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        }).start()
    try {
      // window [0,10s): a=3 events, b=2, c=1 -> top-2 is a then b
      ms.addData(
        Reading("a", t(1), 0), Reading("a", t(2), 0), Reading("a", t(3), 0),
        Reading("b", t(4), 0), Reading("b", t(5), 0), Reading("c", t(6), 0))
      q.processAllAvailable()
      assert(got.isEmpty) // window still open: nothing ranked yet
      ms.addData(Reading("z", t(60), 0)) // watermark past 10s closes it
      q.processAllAvailable()
      val w0 = got.filter(_._1 == 10L).sortBy(_._4)
      assert(w0.map(r => (r._2, r._3, r._4)).toList ==
        List(("a", 3L, 1), ("b", 2L, 2)))
    } finally q.stop()
  }

  test("refreshed dim join re-reads the dimension every micro-batch") {
    // the reference's updatable broadcast-state dim table
    // (BroadcastStateDemo: dict INSERT/UPDATE visible to later events)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KV]
    @volatile var dimRows = Seq(("a", "A1"))
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val q = StreamOps.refreshedDimJoin(ms.toDF(),
      s => { val ss = s; import ss.implicits._; dimRows.toDF("k", "name") },
      Seq("k"),
      (df, _) => got.synchronized {
        got ++= df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      }).start()
    try {
      ms.addData(KV("a", 1)); q.processAllAvailable()
      dimRows = Seq(("a", "A2")) // dim UPDATE between micro-batches
      ms.addData(KV("a", 2)); q.processAllAvailable()
      assert(got.toSet == Set(("a", 1L, "A1"), ("a", 2L, "A2")))
    } finally q.stop()
  }

  test("multiplexed event-time timers fire in deadline order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Reading]
    val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[Reading]
    val fires = StreamOps.multiplexedTimers[Reading](withWm)(_.id,
        r => Seq((r.ts.getTime + 2000L, "short"), (r.ts.getTime + 60000L, "long")))
      .map(f => (f.key, f.tag, f.deadlineMs))
    val q = fires.writeStream.format("memory").queryName("timer_out")
      .outputMode("append").start()
    try {
      ms.addData(Reading("a", t(10), 0)); q.processAllAvailable()
      ms.addData(Reading("a", t(20), 0)); q.processAllAvailable() // wm 20s: fires short@12s
      ms.addData(Reading("a", t(300), 0)); q.processAllAvailable() // fires rest
      val rows = spark.table("timer_out").as[(String, String, Long)].collect()
      assert(rows.count(_._2 == "short") >= 2)
      assert(rows.count(_._2 == "long") >= 1)
      assert(rows.exists(r => r._2 == "short" && r._3 == 12000L))
    } finally q.stop()
  }
}
