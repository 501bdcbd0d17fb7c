package graft.apps

import java.sql.Timestamp

/** Typed record schemas of the reference's case studies (FIXTURES.md;
  * reference bean/case-class citations inline). Event time is carried as
  * TimestampType (`ts`) — the reference parses epoch seconds and
  * multiplies by 1000 (e.g. HotItems.scala:44); here sources convert once
  * at the edge via timestamp_seconds.
  */
// reference scala/.../demo/hotitems/HotItems.scala:65
case class UserBehavior(userId: Long, itemId: Long, categoryId: Int,
    behavior: String, ts: Timestamp)

// reference scala/.../demo/networkflow/NetworkFlow.scala:70
case class ApacheLogEvent(ip: String, userId: String, ts: Timestamp,
    method: String, url: String)

// reference scala/.../demo/loginfail/LoginFail.scala:49,52
case class LoginEvent(userId: Long, ip: String, eventType: String, ts: Timestamp)
case class LoginFailWarning(userId: Long, firstFailTime: Long,
    lastFailTime: Long, warningMsg: String)

// reference scala/.../demo/orderpaydetect/OrderTimeout.scala:46-48
case class OrderEvent(orderId: Long, eventType: String, txId: String, ts: Timestamp)
case class OrderResult(orderId: Long, resultMsg: String)

// reference scala/.../demo/orderpaydetect/TxMatch.scala:54
case class ReceiptEvent(txId: String, payChannel: String, ts: Timestamp)

/** Streaming TxMatch outcome — the reference's three outputs folded into
  * one tagged stream (TxMatch.scala:46-49 main + two side outputs):
  * kind = "matched" | "unmatched-pay" | "unmatched-receipt"; absent-side
  * fields are -1 / "".
  */
case class TxMatchOutcome(txId: String, kind: String, orderId: Long,
    payChannel: String, payTs: Long, receiptTs: Long)

/** NetworkFlow streaming top-N row; `amended` = a late event re-ranked an
  * already-emitted window (the reference's late re-fire,
  * NetworkFlow.scala:112-116).
  */
case class UrlViewRank(windowEnd: Long, url: String, cnt: Long, rank: Int,
    amended: Boolean)

/** Conversion-funnel event/outcome pair for the streaming funnel twin
  * (the analytics tier's CEP form; batch per-step-window form:
  * `graft.operators.Funnel`). `stepsMatched` counts the steps the chain
  * completed before matching or timing out; kind = "match" for a full
  * view->click->purchase conversion, "timeout" for an abandoned funnel
  * flushed by the watermark (the reference's PatternTimeoutFunction side
  * output, OrderTimeoutWithCEP.scala:50-56).
  */
case class FunnelEvent(userId: Long, eventType: String, ts: Timestamp)
case class FunnelOutcome(userId: Long, kind: String, stepsMatched: Int,
    firstTs: Long, lastTs: Long)

// reference scala/.../demo/market/AdClickAnalysis.scala:55-60
case class AdClickLog(userId: Long, adId: Long, province: String,
    city: String, ts: Timestamp)
case class BlackListUserWarning(userId: Long, adId: Long, msg: String)

// reference scala/.../demo/market/AppMarketByChannel.scala:49-52
case class MarketUserBehavior(userId: String, behavior: String,
    channel: String, ts: Timestamp)

// reference scala/.../streamingwithflink/util/SensorReading.scala:7
case class SensorReading(id: String, ts: Timestamp, temperature: Double)

// reference cn/ngt/bean/WaterSensor.java:17-21
case class WaterSensor(id: String, ts: Long, vc: Int)
