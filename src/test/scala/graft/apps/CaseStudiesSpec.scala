package graft.apps

import graft.SparkSpec
import java.sql.Timestamp

class CaseStudiesSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("wordCount") {
    val out = CaseStudies.wordCount(Seq("a b a", " b  c ").toDF("value"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("hotItems ranks items per window end") {
    val behaviors = Seq(
      UserBehavior(1, 100, 1, "pv", t(60)), UserBehavior(2, 100, 1, "pv", t(120)),
      UserBehavior(3, 200, 1, "pv", t(180)), UserBehavior(4, 100, 1, "buy", t(200)),
      UserBehavior(5, 300, 1, "pv", t(240))).toDS()
    val out = CaseStudies.hotItems(behaviors, topN = 2, size = "10 minutes",
      slide = "10 minutes").collect()
    val w600 = out.filter(_.getAs[Long]("windowEnd") == 600L)
    assert(w600.map(r => (r.getAs[Long]("itemId"), r.getAs[Long]("cnt"), r.getAs[Int]("rank"))).toSet ==
      Set((100L, 2L, 1), (200L, 1L, 2))) // buy filtered; 300 vs 200 tie broken by itemId
  }

  test("pageViewSalted two-phase equals plain count") {
    val behaviors = (1 to 500).map(i => UserBehavior(i, i % 7, 1, "pv", t(i % 3000))).toDS()
    val out = CaseStudies.pageViewSalted(behaviors, salts = 8).as[(Long, Long)].collect().toMap
    assert(out(0L) == 500L)
  }

  test("uniqueVisitors exact and approx") {
    val behaviors = (1 to 100).map(i => UserBehavior(i % 10, i, 1, "pv", t(i))).toDS()
    val exact = CaseStudies.uniqueVisitors(behaviors).as[(Long, Long)].collect().toMap
    assert(exact(0L) == 10L)
    val approx = CaseStudies.uniqueVisitors(behaviors, exact = false)
      .as[(Long, Long)].collect().toMap
    assert(math.abs(approx(0L) - 10L) <= 2)
  }

  test("uniqueVisitorsBloom approximates exact UV") {
    val behaviors = (1 to 2000).map(i => UserBehavior(i % 300, i, 1, "pv", t(i))).toDS()
    val est = CaseStudies.uniqueVisitorsBloom(behaviors, numBits = 1 << 16)
      .as[(Long, Long)].collect().toMap
    assert(math.abs(est(0L) - 300L) <= 15, s"bloom estimate ${est(0L)}")
  }

  test("loginFailWarnings (reference 3-fails-in-5s golden)") {
    val logins = Seq(
      LoginEvent(1, "a", "fail", t(1)), LoginEvent(1, "a", "fail", t(2)),
      LoginEvent(1, "a", "fail", t(3)),
      LoginEvent(2, "b", "fail", t(1)), LoginEvent(2, "b", "success", t(2)),
      LoginEvent(2, "b", "fail", t(3))).toDS()
    val out = CaseStudies.loginFailWarnings(logins).collect()
    assert(out.length == 1 && out.head.userId == 1L &&
      out.head.firstFailTime == 1L && out.head.lastFailTime == 3L)
  }

  test("orderTimeouts matches paid and extracts timeouts") {
    val orders = Seq(
      OrderEvent(1, "create", "", t(0)), OrderEvent(1, "pay", "tx1", t(600)),
      OrderEvent(2, "create", "", t(0)),
      OrderEvent(3, "create", "", t(0)), OrderEvent(3, "pay", "tx3", t(1000))).toDS()
    val out = CaseStudies.orderTimeouts(orders).collect()
      .map(r => r.orderId -> r.resultMsg).toMap
    assert(out(1L) == "payed successfully")
    assert(out(2L) == "order timeout")
    assert(out(3L) == "order timeout") // paid after the 15-min deadline
  }

  test("txMatch splits matched and unmatched (reference TxMatch golden shape)") {
    val pays = Seq(
      OrderEvent(1, "pay", "tx1", t(100)), OrderEvent(2, "pay", "tx2", t(200)),
      OrderEvent(3, "pay", "tx3", t(300))).toDS()
    val receipts = Seq(
      ReceiptEvent("tx1", "wechat", t(103)),   // within +10s
      ReceiptEvent("tx2", "alipay", t(290)),   // too late (not in [-5,+10])
      ReceiptEvent("tx9", "card", t(300))).toDS()
    val (matched, unPays, unReceipts) = CaseStudies.txMatch(pays, receipts)
    assert(matched.select("txId").as[String].collect().toSeq == Seq("tx1"))
    assert(unPays.select("txId").as[String].collect().toSet == Set("tx3"))
    assert(unReceipts.select("rTxId").as[String].collect().toSet == Set("tx9"))
  }

  test("adClickAnalysis blacklists heavy clickers and excludes them") {
    val spam = (1 to 120).map(i => AdClickLog(7, 42, "zj", "hz", t(i)))
    val normal = (1 to 10).map(i => AdClickLog(8, 42, "zj", "hz", t(i)))
    val (byProvince, blacklist) = CaseStudies.adClickAnalysis(
      (spam ++ normal).toDS(), threshold = 100, size = "1 hour", slide = "1 hour")
    val bl = blacklist.select("userId", "adId").as[(Long, Long)].collect().toSet
    assert(bl == Set((7L, 42L)))
    val cnt = byProvince.select("cnt").as[Long].collect().sum
    assert(cnt == 10L) // spam user's clicks excluded from province stats
  }

  test("appMarketByChannel filters uninstall") {
    val evs = Seq(
      MarketUserBehavior("u1", "install", "appstore", t(10)),
      MarketUserBehavior("u2", "uninstall", "appstore", t(20)),
      MarketUserBehavior("u3", "view", "weibo", t(30))).toDS()
    val out = CaseStudies.appMarketByChannel(evs, "1 hour", "1 hour")
    assert(out.select("cnt").as[Long].collect().sum == 2L)
  }

  test("telemetryHistogram bins with cap (BMW golden shape)") {
    val rows = Seq(("m1", "bj", 5.0), ("m1", "bj", 15.0), ("m1", "bj", 999.0),
      ("m2", "sh", 25.0)).toDF("model", "city", "mile")
    val out = CaseStudies.telemetryHistogram(rows, "mile", 10.0, 140.0,
        cities = Seq("bj", "sh"))
      .as[(String, Double, Long)].collect().toSet
    assert(out == Set(("m1", 0.0, 1L), ("m1", 10.0, 1L), ("m1", 140.0, 1L),
      ("m2", 20.0, 1L)))
  }

  test("averageSensor converts F->C per window") {
    val rs = Seq(SensorReading("s1", t(1), 212.0), SensorReading("s1", t(2), 32.0)).toDS()
    val out = CaseStudies.averageSensor(rs).collect()
    assert(out.length == 1 && math.abs(out.head.getAs[Double]("avgTemp") - 50.0) < 1e-9)
  }
}
