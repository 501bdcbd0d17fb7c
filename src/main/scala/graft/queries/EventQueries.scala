package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time semantics over the `events` table — the batch-equivalent
  * surface of the reference's windowing/join/CEP capabilities. The
  * streaming forms of the same operators live in graft.streaming (same
  * logic over readStream + watermarks); these batch forms are what the
  * DuckDB oracle can check.
  *
  * Reference capabilities covered:
  *  - interval join        (java/.../transformation/IntervalJoinDemo.java:58-68)
  *  - tumbling window      (java/.../window/EvenTimeTumblingWindowDemo.java:36-43)
  *  - sliding window       (java/.../window/ProcessingTimeSlidingWindowDemo.java:37-40)
  *  - session window       (java/.../window/EventTimeSessionWindowDemo.java:43)
  *  - CEP n-consecutive    (scala/.../demo/loginfail/LoginFailWithCep.scala:38-54)
  *  - count window         (java/.../window/CountWindowDemo.java:32)
  *  - running aggregate    (java/.../transformation/SumDemo.java:37 — per-record
  *                          continuous aggregate ≈ cumulative window)
  *  - pivot / channel stats (scala/.../demo/market/AppMarketByChannel.scala:49-52)
  */
object EventQueries extends QueryModule {
  import Q._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interval join: purchases within 30 min after a signup, per user.
    // Equi-key on user_id + time-range predicate — at scale this is
    // Spark's stream-stream interval join; batch plans an equi-join with
    // the range as residual filter (no cross product).
    "q11_interval_join" -> ((spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val su = ev.filter($"event_type" === "signup")
        .select($"user_id", $"event_id".as("signup_id"), $"ts".as("sts"))
      val pu = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts".as("pts"))
      su.join(pu, su("user_id") === pu("p_user") &&
          pu("pts") > su("sts") &&
          pu("pts") <= su("sts") + expr("INTERVAL 30 MINUTES"))
        .select($"user_id", $"signup_id", $"purchase_id")
    }),

    // Tumbling event-time window, 1 hour per event_type.
    "q12_window_tumble" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type", window($"ts", "1 hour"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
        .select($"event_type", $"window.start".cast("long").as("w_start"), $"n", $"total")
    }),

    // Sliding window 1 hour / slide 15 min (each event lands in 4 windows).
    "q13_window_slide" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type", window($"ts", "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
        .select($"event_type", $"window.start".cast("long").as("w_start"), $"n", $"total")
    }),

    // Session window, 30-minute gap, per user. Spark semantics: an event
    // extends the session iff ts < prev_session_end (= last ts + gap).
    "q14_session_window" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total"))
        .select($"user_id", $"session_window.start".cast("long").as("sess_start"),
          $"n_events", $"total")
    }),

    // CEP: three consecutive 'error' events (no intervening other type)
    // within 2 days, per user — the batch analog of the login-fail
    // pattern; the streaming NFA form is graft.streaming.Cep.
    "q15_cep_3error" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(spark, dir)
        .withColumn("e1", lag($"event_type", 1).over(w))
        .withColumn("e2", lag($"event_type", 2).over(w))
        .withColumn("t2", lag($"ts", 2).over(w))
        .filter($"event_type" === "error" && $"e1" === "error" && $"e2" === "error" &&
          $"ts" <= $"t2" + expr("INTERVAL 2 DAYS"))
        .select($"user_id", $"event_id".as("third_event_id"),
          epochS($"t2").as("first_error_sec"), epochS($"ts").as("third_error_sec"))
    }),

    // Count window: per-key buckets of 10 records in (ts, event_id) order
    // (reference fires every N records per key; batch analog via
    // row_number; streaming form: graft.streaming.CountWindows).
    "q16_count_window" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(spark, dir)
        .withColumn("win_id", floor((row_number().over(w) - 1) / 10).cast("long"))
        .groupBy($"user_id", $"win_id")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total"),
          min($"event_id").as("first_event"), max($"event_id").as("last_event"))
    }),

    // Running (continuous) aggregate — the defining semantics of the
    // reference's keyed streaming sum: one output per input record with
    // the cumulative value so far. Exact decimal accumulation.
    "q17_running_total" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .withColumn("running_total", sum(dec2($"value")).over(w).cast("double"))
        .withColumn("seq", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .select($"user_id", $"event_id", $"seq", $"running_total")
    }),

    // Pivot: daily counts per event type (app-market channel stats shape).
    "q18_pivot_daily" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("day", $"ts".cast("date"))
        .groupBy($"day")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0)
    }),

    // JSON-ish property extraction (connector format surface —
    // cn/ngt/day10/_04_Source_Kafka.java:40 withFormat(Json)): pull k out
    // of props, aggregate per event type.
    "q19_props_extract" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("k", regexp_extract($"props", "([0-9]+)", 1).cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q11_interval_join" ->
      s"""WITH $eventsUs
         |SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
         |FROM ev s JOIN ev p
         |  ON s.user_id = p.user_id
         | AND s.event_type = 'signup' AND p.event_type = 'purchase'
         | AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 30 MINUTE""".stripMargin,

    "q12_window_tumble" ->
      s"""WITH $eventsUs
         |SELECT event_type, (epoch_us(ts) // 3600000000) * 3600 AS w_start,
         |  COUNT(*) AS n, ${oSum("value")} AS total
         |FROM ev GROUP BY 1, 2""".stripMargin,

    "q13_window_slide" ->
      s"""WITH $eventsUs
         |SELECT event_type,
         |  (epoch_us(ts) // 900000000) * 900 - k * 900 AS w_start,
         |  COUNT(*) AS n, ${oSum("value")} AS total
         |FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
         |GROUP BY 1, 2""".stripMargin,

    "q14_session_window" ->
      s"""WITH $eventsUs,
         |marked AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT *, COUNT(CASE WHEN new_sess = 1 THEN 1 END)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM marked)
         |SELECT user_id, epoch_us(MIN(ts)) // 1000000 AS sess_start,
         |  COUNT(*) AS n_events, ${oSum("value")} AS total
         |FROM sess GROUP BY user_id, sess_id""".stripMargin,

    "q15_cep_3error" ->
      s"""WITH $eventsUs,
         |x AS (
         |  SELECT user_id, event_id, ts, event_type,
         |    lag(event_type, 1) OVER w AS e1,
         |    lag(event_type, 2) OVER w AS e2,
         |    lag(ts, 2) OVER w AS t2
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, event_id AS third_event_id,
         |  epoch_us(t2) // 1000000 AS first_error_sec,
         |  epoch_us(ts) // 1000000 AS third_error_sec
         |FROM x
         |WHERE event_type = 'error' AND e1 = 'error' AND e2 = 'error'
         |  AND ts <= t2 + INTERVAL 2 DAY""".stripMargin,

    "q16_count_window" ->
      s"""WITH $eventsUs,
         |numbered AS (
         |  SELECT user_id, event_id, value,
         |    (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 10 AS win_id
         |  FROM ev)
         |SELECT user_id, win_id, COUNT(*) AS n, ${oSum("value")} AS total,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
         |FROM numbered GROUP BY user_id, win_id""".stripMargin,

    "q17_running_total" ->
      s"""WITH $eventsUs
         |SELECT user_id, event_id,
         |  row_number() OVER w AS seq,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q18_pivot_daily" ->
      s"""WITH $eventsUs
         |SELECT CAST(ts AS DATE) AS day,
         |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
         |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
         |FROM ev GROUP BY 1""".stripMargin,

    "q19_props_extract" ->
      s"""WITH $eventsUs
         |SELECT event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
         |  MIN(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS min_k,
         |  MAX(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS max_k
         |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
