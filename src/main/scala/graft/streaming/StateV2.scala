package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Spark 4 `transformWithState` surface — the engine-native successor to
  * flatMapGroupsWithState, closing the two deltas the GroupState tier had
  * to work around:
  *
  *  - per-state-variable TTL (reference StateTtlConfig,
  *    java/.../state/KeyedStateTTLDemo.java:64-70): the state store
  *    expires values itself — no manual timeout bookkeeping;
  *  - real multiple timers per key (reference two-timer pattern,
  *    scala/.../demo/networkflow/NetworkFlow.scala:112-123): registerTimer
  *    can arm any number of deadlines, so StreamOps.multiplexedTimers'
  *    deadline-list workaround isn't needed on this API.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`) — which is the 100 TB posture
  * anyway.
  */
object StateV2 {

  /** Running count per key with native state TTL (value expires after
    * `ttl` of processing-time inactivity, resetting the count).
    */
  class RunningCountProcessor[E](ttl: TTLConfig)
      extends StatefulProcessor[String, E, (String, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, ttl)
    override def handleInputRows(key: String, rows: Iterator[E],
        tv: TimerValues): Iterator[(String, Long)] = {
      val next = (if (st.exists()) st.get() else 0L) + rows.size
      st.update(next)
      Iterator((key, next))
    }
  }

  /** TimeMode is None unless a TTL is requested: any processing-time mode
    * keeps the engine scheduling no-data batches, so processAllAvailable()
    * never settles (same hazard as GroupStateTimeout.ProcessingTimeTimeout).
    */
  def runningCountWithTtl[E](ds: Dataset[E])(keyFn: E => String,
      ttlMs: Long = 0L): Dataset[(String, Long)] = {
    implicit val se: Encoder[String] = Encoders.STRING
    implicit val oe: Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val ttl = if (ttlMs > 0) TTLConfig(Duration.ofMillis(ttlMs)) else TTLConfig.NONE
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(keyFn).transformWithState(
      new RunningCountProcessor[E](ttl), mode, OutputMode.Update())
  }

  /** One fired timer (multi-timer form of StreamOps.TimerFire). */
  case class Fire(key: String, deadlineMs: Long)

  /** Per-event deadline registration with REAL multiple timers per key:
    * each input event arms one event-time timer at `deadlineOf(e)`; every
    * timer fires individually when the watermark passes it — the
    * reference's two-timer ProcessFunction without deadline multiplexing.
    */
  class MultiTimerProcessor[E](deadlineOf: E => Long)
      extends StatefulProcessor[String, E, Fire] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(key: String, rows: Iterator[E],
        tv: TimerValues): Iterator[Fire] = {
      // a deadline already behind the watermark would never fire as a
      // timer: emit synchronously instead (same semantics as an immediate
      // timer), so late events still get their Fire
      val out = List.newBuilder[Fire]
      rows.foreach { e =>
        val d = deadlineOf(e)
        if (d > tv.getCurrentWatermarkInMs()) getHandle.registerTimer(d)
        else out += Fire(key, d)
      }
      out.result().iterator
    }
    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Fire] =
      Iterator(Fire(key, info.getExpiryTimeInMs()))
  }

  def multiTimers[E](ds: Dataset[E])(keyFn: E => String,
      deadlineOf: E => Long): Dataset[Fire] = {
    implicit val se: Encoder[String] = Encoders.STRING
    implicit val oe: Encoder[Fire] = Encoders.product[Fire]
    ds.groupByKey(keyFn).transformWithState(
      new MultiTimerProcessor[E](deadlineOf),
      TimeMode.EventTime(), OutputMode.Append())
  }
}
