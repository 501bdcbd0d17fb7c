package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamingAppsSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("hotItemsStream ranks each closed window once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[UserBehavior]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Int)]()
    val q = StreamingApps.hotItemsStream(ms.toDF(), topN = 2,
        size = "10 seconds", slide = "10 seconds") {
        (ranked, _) => got.synchronized {
          got ++= ranked.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        }
      }.start()
    try {
      // window [0,10s): item 1 -> 3 views, item 2 -> 2, item 3 -> 1
      ms.addData(
        UserBehavior(1, 1, 0, "pv", t(1)), UserBehavior(2, 1, 0, "pv", t(2)),
        UserBehavior(3, 1, 0, "pv", t(3)), UserBehavior(4, 2, 0, "pv", t(4)),
        UserBehavior(5, 2, 0, "pv", t(5)), UserBehavior(6, 3, 0, "pv", t(6)),
        UserBehavior(7, 9, 0, "buy", t(7))) // non-pv filtered out
      q.processAllAvailable()
      assert(got.isEmpty) // window open
      ms.addData(UserBehavior(8, 9, 0, "pv", t(60)))
      q.processAllAvailable()
      val w0 = got.filter(_._1 == 10L).sortBy(_._4)
      assert(w0.map(r => (r._2, r._3, r._4)).toList ==
        List((1L, 3L, 1), (2L, 2L, 2)))
    } finally q.stop()
  }

  test("loginFailStream emits the reference warning") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[LoginEvent]
    val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[LoginEvent]
    val out = StreamingApps.loginFailStream(withWm, fails = 3, withinMs = 5000L)
    val q = out.writeStream.format("memory").queryName("lf_out")
      .outputMode("append").start()
    try {
      ms.addData(LoginEvent(1, "ip", "fail", t(1)), LoginEvent(1, "ip", "fail", t(2)))
      q.processAllAvailable()
      ms.addData(LoginEvent(1, "ip", "fail", t(3)))
      q.processAllAvailable()
      val rows = spark.table("lf_out").as[LoginFailWarning].collect()
      assert(rows.length == 1)
      assert(rows.head.userId == 1 && rows.head.firstFailTime == 1 &&
        rows.head.lastFailTime == 3)
    } finally q.stop()
  }

  test("orderTimeoutStream emits matches and watermark-expired timeouts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[OrderEvent]
    val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[OrderEvent]
    val out = StreamingApps.orderTimeoutStream(withWm, payDeadlineMs = 60000L)
    val q = out.writeStream.format("memory").queryName("ot_out")
      .outputMode("append").start()
    try {
      // note: events at epoch second 0 would equal the initial watermark
      // and be dropped as late — start at t(10)
      ms.addData(OrderEvent(1, "create", "", t(10)), OrderEvent(2, "create", "", t(11)))
      q.processAllAvailable()
      ms.addData(OrderEvent(1, "pay", "tx1", t(40))) // order 1 pays in time
      q.processAllAvailable()
      ms.addData(OrderEvent(9, "create", "", t(500))) // watermark past deadline
      q.processAllAvailable()
      val rows = spark.table("ot_out").as[OrderResult].collect()
        .map(r => r.orderId -> r.resultMsg).toMap
      assert(rows(1L) == "payed successfully")
      assert(rows(2L) == "order timeout")
    } finally q.stop()
  }

  test("adClickBlacklistStream warns once per day and resets on rollover") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[AdClickLog]
    val out = StreamingApps.adClickBlacklistStream(ms.toDS(), threshold = 2)
    val q = out.writeStream.format("memory").queryName("bl_out")
      .outputMode("append").start()
    try {
      def click(sec: Long) = AdClickLog(7, 42, "p", "c", t(sec))
      ms.addData(click(10), click(20), click(30)) // 3 > 2 -> warn
      q.processAllAvailable()
      ms.addData(click(40)) // same day: already warned, silent
      q.processAllAvailable()
      val day2 = 86400L
      ms.addData(click(day2 + 10), click(day2 + 20), click(day2 + 30)) // reset, re-warn
      q.processAllAvailable()
      val rows = spark.table("bl_out").as[BlackListUserWarning].collect()
      assert(rows.length == 2, s"expected one warning per day, got ${rows.toSeq}")
      assert(rows.forall(w => w.userId == 7 && w.adId == 42))
    } finally q.stop()
  }

  test("adClickBlacklistStream: a late previous-day click cannot reset the current day") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[AdClickLog]
    // 1h lateness admits cross-day stragglers — exactly the case where a
    // naive day != state.day rollover wipes today's count + warned flag
    val out = StreamingApps.adClickBlacklistStream(ms.toDS(), threshold = 2,
      wmDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("bl_late_out")
      .outputMode("append").start()
    try {
      def click(sec: Long) = AdClickLog(7, 42, "p", "c", t(sec))
      val day2 = 86400L
      ms.addData(click(day2 + 10), click(day2 + 20), click(day2 + 30)) // warn on day 2
      q.processAllAvailable()
      // straggler from day 1, within the 1h lateness allowance
      ms.addData(click(day2 - 60))
      q.processAllAvailable()
      ms.addData(click(day2 + 40), click(day2 + 50), click(day2 + 60))
      q.processAllAvailable()
      val rows = spark.table("bl_late_out").as[BlackListUserWarning].collect()
      assert(rows.length == 1,
        s"late straggler reset the day -> duplicate warning: ${rows.toSeq}")
    } finally q.stop()
  }

  test("adClickBlacklistStream GCs idle pairs once the watermark passes the idle horizon") {
    // the 100 TB guard: state must hold only ACTIVE (user, ad) pairs, not
    // every pair ever seen — idle pairs time out at day end + idleDays
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[AdClickLog]
    val out = StreamingApps.adClickBlacklistStream(ms.toDS(), threshold = 100,
      idleDays = 1)
    val q = out.writeStream.format("memory").queryName("bl_gc_out")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // day 0: three distinct pairs -> three state rows
      ms.addData(AdClickLog(1, 1, "p", "c", t(10)),
        AdClickLog(2, 2, "p", "c", t(20)), AdClickLog(3, 3, "p", "c", t(30)))
      q.processAllAvailable()
      assert(stateRows == 3, s"expected 3 live pairs, got $stateRows")
      // jump the watermark past day0's horizon (day end + 1 idle day =
      // 2 days); the day-3 click arms its own fresh state entry
      val day3 = 3 * 86400L
      ms.addData(AdClickLog(9, 9, "p", "c", t(day3)))
      q.processAllAvailable()
      // one more batch so the expired timers are processed and reported
      ms.addData(AdClickLog(9, 9, "p", "c", t(day3 + 10)))
      q.processAllAvailable()
      assert(stateRows == 1,
        s"idle day-0 pairs not GC'd: $stateRows state rows")
    } finally q.stop()
  }

  test("uniqueVisitorsStream approx matches exact on small data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[UserBehavior]
    val out = StreamingApps.uniqueVisitorsStream(ms.toDF(), size = "10 seconds")
    val q = out.writeStream.format("memory").queryName("uv_out")
      .outputMode("append").start()
    try {
      ms.addData((1 to 20).map(i =>
        UserBehavior(i % 7, i, 0, "pv", t(i % 9))): _*)
      q.processAllAvailable()
      ms.addData(UserBehavior(99, 99, 0, "pv", t(60)))
      q.processAllAvailable()
      val uv = spark.table("uv_out").as[(Long, Long)].collect()
        .find(_._1 == 0L).map(_._2)
      assert(uv.exists(v => v >= 6 && v <= 8)) // 7 distinct users, approx
    } finally q.stop()
  }
}
