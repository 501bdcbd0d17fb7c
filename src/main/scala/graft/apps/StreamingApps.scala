package graft.apps

import graft.streaming.{Cep, StreamOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The reference's streaming jobs end-to-end: each is a thin composition
  * of the library operators over a streaming `Dataset` of the typed
  * records in [[graft.apps]] — a user of the reference runs the same job
  * by swapping `readTextFile → readStream` and keeping the operator
  * chain. Batch twins live in [[CaseStudies]]; these are the unbounded
  * forms with watermarks + state.
  */
object StreamingApps {

  /** HotItems streaming (reference HotItems.scala:47-58): pv filter →
    * sliding windowed count → top-N per closed window via the append-mode
    * rank (each window ranked exactly once, when its watermark closes).
    */
  def hotItemsStream(behaviors: DataFrame, topN: Int = 5,
      size: String = "1 hour", slide: String = "5 minutes",
      wmDelay: String = "0 seconds")(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    val pv = behaviors.filter(col("behavior") === "pv")
    pv.withWatermark("ts", wmDelay)
      .groupBy(window(col("ts"), size, slide), col("itemId"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("append").foreachBatch {
        (batch: DataFrame, id: Long) =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("window")).orderBy(col("cnt").desc, col("itemId"))
          sink(batch.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= topN)
            .select(col("window.end").cast("long").as("windowEnd"),
              col("itemId"), col("cnt"), col("rank")), id)
          ()
      }
  }

  /** UV per window, streaming (reference UniqueVisitor/WithBloom): the
    * bounded-memory approx path is the 100 TB default.
    */
  def uniqueVisitorsStream(behaviors: DataFrame, size: String = "1 hour",
      wmDelay: String = "0 seconds", exact: Boolean = false): DataFrame = {
    val base = behaviors.filter(col("behavior") === "pv")
      .withWatermark("ts", wmDelay)
      .groupBy(window(col("ts"), size))
    val agg = if (exact) base.agg(countDistinct(col("userId")).as("uv"))
      else base.agg(approx_count_distinct(col("userId")).as("uv"))
    agg.select(col("window.start").cast("long").as("windowStart"), col("uv"))
  }

  /** Login-fail streaming (reference LoginFailWithCep): n consecutive
    * fails within the window, per user, via the streaming NFA.
    */
  def loginFailStream(logins: Dataset[LoginEvent], fails: Int = 3,
      withinMs: Long = 5000L): Dataset[LoginFailWarning] = {
    import logins.sparkSession.implicits._
    val pat = Cep.Pattern.begin[LoginEvent]("fail")(_.eventType == "fail")
      .times(fails).within(withinMs)
    Cep.detectStream(logins)(_.userId.toString, _.ts.getTime, pat)
      .filter(_.kind == "match")
      .map(r => LoginFailWarning(r.key.toLong, r.firstTs / 1000,
        r.lastTs / 1000, s"login failed ${r.events.size} times in a row"))
  }

  /** Ad-click blacklisting, streaming (reference
    * AdClickAnalysis.scala:81-123): per (user, ad), count clicks per
    * event-time day; crossing `threshold` warns ONCE per day; a new day
    * resets count + warned flag (the reference's daily reset timer,
    * expressed as a day-rollover comparison — the next event carries its
    * own day). State: one small tuple per ACTIVE (user, ad) pair only —
    * each update arms an event-time timeout at the end of the pair's day
    * plus `idleDays`, and the timeout removes the state, so idle pairs are
    * GC'd once the watermark passes that horizon. Without this the pair
    * space (users × ads) grows without bound at 100 TB. Requires a
    * watermark; `wmDelay` is applied to `ts` here.
    */
  case class ClickState(daySec: Long, count: Long, warned: Boolean)

  def adClickBlacklistStream(clicks: Dataset[AdClickLog], threshold: Long,
      wmDelay: String = "0 seconds", idleDays: Int = 1)
      : Dataset[BlackListUserWarning] = {
    import clicks.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val st: org.apache.spark.sql.Encoder[ClickState] =
      org.apache.spark.sql.Encoders.product[ClickState]
    val dayMs = 86400000L
    clicks.withWatermark("ts", wmDelay)
      .as[AdClickLog]
      .groupByKey(c => (c.userId, c.adId))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), it: Iterator[AdClickLog], state: GroupState[ClickState]) =>
          if (state.hasTimedOut) {
            // idle horizon passed: drop the pair's state entirely
            state.remove()
            Iterator.empty
          } else {
            val out = List.newBuilder[BlackListUserWarning]
            var s = state.getOption.getOrElse(ClickState(-1L, 0L, warned = false))
            it.toSeq.sortBy(_.ts.getTime).foreach { c =>
              val day = c.ts.getTime / dayMs
              // only a LATER day rolls the counter over; a late click from
              // an earlier day (admitted by wmDelay) must not wipe the
              // current day's count + warned flag — it belongs to a day
              // whose books are closed and is dropped
              if (day > s.daySec) s = ClickState(day, 0L, warned = false)
              if (day == s.daySec) {
                s = s.copy(count = s.count + 1)
                if (s.count > threshold && !s.warned) {
                  s = s.copy(warned = true)
                  out += BlackListUserWarning(key._1, key._2,
                    s"click over $threshold times today")
                }
              }
            }
            state.update(s)
            // GC when the watermark passes the end of this pair's day plus
            // the idle allowance (always > watermark: the day stems from an
            // event at/after watermark - wmDelay and idleDays >= 1)
            state.setTimeoutTimestamp((s.daySec + 1 + idleDays) * dayMs)
            out.result().iterator
          }
      }
  }

  /** Order-timeout streaming (reference OrderTimeoutWithCEP): matches AND
    * watermark-expired timeouts stream out of the same NFA (the timeout
    * side output).
    */
  def orderTimeoutStream(orders: Dataset[OrderEvent],
      payDeadlineMs: Long = 15 * 60 * 1000L): Dataset[OrderResult] = {
    import orders.sparkSession.implicits._
    val pat = Cep.Pattern.begin[OrderEvent]("create")(_.eventType == "create")
      .followedBy("pay")(_.eventType == "pay").within(payDeadlineMs)
    Cep.detectStream(orders)(_.orderId.toString, _.ts.getTime, pat,
        emitTimeouts = true)
      .map(r => OrderResult(r.key.toLong,
        if (r.kind == "match") "payed successfully" else "order timeout"))
  }
}
