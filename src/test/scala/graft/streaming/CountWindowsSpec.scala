package graft.streaming

import graft.SparkSpec
import graft.streaming.CountWindows._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class KV(k: String, v: Long)

/** Reference golden: keyed count window fires every N records per key
  * (java/.../window/CountWindowDemo.java:32); global variant sorts window
  * contents (CountWindowAllApplyDemo.java:44-55); sliding count windows
  * (cn/ngt/day11/_06_GroupWindow_Count.java:40-50).
  */
class CountWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("batch tumbling count window of 3 per key") {
    val ds = Seq(KV("a", 1), KV("a", 2), KV("b", 10), KV("a", 3), KV("a", 4),
      KV("b", 11), KV("b", 12), KV("a", 5), KV("a", 6)).zipWithIndex
      .map { case (kv, i) => KV(kv.k, kv.v * 100 + i) }.toDS()
    // order key = v*100+i keeps arrival order; windows of 3
    val out = tumblingBatch(ds)(_.k, _.v, size = 3).collect()
    val a = out.filter(_.key == "a").sortBy(_.windowSeq)
    assert(a.length == 2 && a.forall(_.events.size == 3))
    assert(out.count(_.key == "b") == 1)
  }

  test("batch tumbling partial emission") {
    val ds = Seq(KV("a", 1), KV("a", 2)).toDS()
    assert(tumblingBatch(ds)(_.k, _.v, 3).collect().isEmpty)
    val withPartial = tumblingBatch(ds)(_.k, _.v, 3, emitPartial = true).collect()
    assert(withPartial.length == 1 && withPartial.head.events.size == 2)
  }

  test("batch sliding count window size 4 slide 2 fires early partials") {
    val ds = Seq.tabulate(6)(i => KV("a", i.toLong)).toDS()
    val out = slidingBatch(ds)(_.k, _.v, size = 4, slide = 2)
      .collect().sortBy(_.windowSeq)
    // fires at records 2,4,6 with last min(size, seen) records
    assert(out.map(_.events.map(_.v)).toSeq ==
      Seq(Seq(0L, 1L), Seq(0L, 1L, 2L, 3L), Seq(2L, 3L, 4L, 5L)))
  }

  test("streaming tumbling count window fires across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KV]
    val out = tumblingStream(ms.toDS())(_.k, _.v, size = 3)
      .map(w => (w.key, w.windowSeq, w.events.map(_.v).sum))
    val q = out.writeStream.format("memory").queryName("cw_out")
      .outputMode("append").start()
    try {
      ms.addData(KV("a", 1), KV("a", 2)); q.processAllAvailable()
      assert(spark.table("cw_out").count() == 0) // buffered, not fired
      ms.addData(KV("a", 3), KV("a", 4)); q.processAllAvailable()
      val rows = spark.table("cw_out").as[(String, Long, Long)].collect()
      assert(rows.toSeq == Seq(("a", 0L, 6L))) // 1+2+3 fired, 4 buffered
    } finally q.stop()
  }

  test("streaming sliding count window agrees with the batch form") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Seq.tabulate(11)(i => KV(if (i % 3 == 0) "b" else "a", i.toLong))
    val ms = MemoryStream[KV]
    val out = slidingStream(ms.toDS())(_.k, _.v, size = 4, slide = 2)
      .map(w => (w.key, w.windowSeq, w.events.map(_.v)))
    val q = out.writeStream.format("memory").queryName("scw_out")
      .outputMode("append").start()
    try {
      // feed across three micro-batches so windows span batch boundaries
      ms.addData(events.take(3): _*); q.processAllAvailable()
      ms.addData(events.slice(3, 8): _*); q.processAllAvailable()
      ms.addData(events.drop(8): _*); q.processAllAvailable()
      val streamed = spark.table("scw_out").as[(String, Long, Seq[Long])]
        .collect().toSeq.sortBy(r => (r._1, r._2))
      val batch = slidingBatch(events.toDS())(_.k, _.v, size = 4, slide = 2)
        .collect().toSeq.map(w => (w.key, w.windowSeq, w.events.map(_.v)))
        .sortBy(r => (r._1, r._2))
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming seq counter survives a batch ending on a window boundary") {
    // regression: when a micro-batch ended exactly as a window fired, the
    // emptied buffer was removed from state and the next batch restarted
    // windowSeq at 0, duplicating (key, windowSeq) ids.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KV]
    val out = tumblingStream(ms.toDS())(_.k, _.v, size = 2)
      .map(w => (w.key, w.windowSeq, w.events.map(_.v).toList))
    val q = out.writeStream.format("memory").queryName("cw_seq")
      .outputMode("append").start()
    try {
      ms.addData(KV("a", 1), KV("a", 2)); q.processAllAvailable() // fires seq 0, buffer empty
      ms.addData(KV("a", 3), KV("a", 4)); q.processAllAvailable() // must fire seq 1
      val rows = spark.table("cw_seq").as[(String, Long, List[Long])].collect()
        .sortBy(_._2)
      assert(rows.map(r => (r._1, r._2)).toSeq == Seq(("a", 0L), ("a", 1L)))
    } finally q.stop()
  }
}
