package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** transformWithState operators (Spark 4 API) under the RocksDB state
  * store provider, which the API requires.
  */
class StateV2Spec extends SparkSpec {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("transformWithState running count accumulates across micro-batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[KV](s)
    val out = StateV2.runningCountWithTtl(ms.toDS())(_.k)
    val q = out.toDF("key", "cnt").writeStream.format("memory")
      .queryName("twscnt").outputMode("update").start()
    try {
      ms.addData(KV("a", 1), KV("a", 2), KV("b", 3)); q.processAllAvailable()
      ms.addData(KV("a", 4)); q.processAllAvailable()
      val rows = s.table("twscnt").as[(String, Long)].collect().toSet
      assert(rows == Set(("a", 2L), ("b", 1L), ("a", 3L)))
    } finally q.stop()
  }

  test("transformWithState multiple event-time timers fire per key") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[Reading](s)
    val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[Reading]
    // each reading arms TWO deadlines (+2s and +5s) via two map passes —
    // the processor registers one timer per input row
    val doubled = withWm.flatMap(r => Seq(r, r.copy(temp = r.temp + 1000)))
    val fires = StateV2.multiTimers(doubled)(_.id,
      r => r.ts.getTime + (if (r.temp >= 1000) 5000L else 2000L))
    val q = fires.toDF("key", "deadlineMs").writeStream.format("memory")
      .queryName("twstimer").outputMode("append").start()
    try {
      ms.addData(Reading("a", new Timestamp(10000L), 0))
      q.processAllAvailable()
      ms.addData(Reading("zz", new Timestamp(60000L), 0)) // advance watermark
      q.processAllAvailable()
      ms.addData(Reading("zz", new Timestamp(90000L), 0)) // flush zz's own
      q.processAllAvailable()
      val rows = s.table("twstimer").as[(String, Long)].collect()
        .filter(_._1 == "a").map(_._2).sorted.toSeq
      assert(rows == Seq(12000L, 15000L)) // both timers fired for one key
    } finally q.stop()
  }

  test("deadline already behind the watermark fires synchronously, not silently dropped") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[Reading](s)
    val src = ms.toDS().withWatermark("ts", "0 seconds").as[Reading]
    // deadline = event time MINUS a minute: an on-time event can carry a
    // deadline already behind the watermark (e.g. re-processing a backlog)
    val fires = StateV2.multiTimers(src)(_.id, _.ts.getTime - 60000L)
    val q = fires.toDF("key", "deadlineMs").writeStream.format("memory")
      .queryName("twslate").outputMode("append").start()
    try {
      ms.addData(Reading("w", new Timestamp(100000L), 0)) // watermark -> 100s
      q.processAllAvailable()
      // on-time event at 150s, deadline 90s < watermark 100s — a
      // registered timer would never fire; the Fire must come out NOW
      ms.addData(Reading("b", new Timestamp(150000L), 0))
      q.processAllAvailable()
      val got = s.table("twslate").as[(String, Long)].collect()
        .filter(_._1 == "b").map(_._2).toSeq
      assert(got == Seq(90000L), s"past-watermark deadline lost: $got")
    } finally q.stop()
  }
}
