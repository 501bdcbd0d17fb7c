package graft.queries

import graft.Tables
import graft.streaming.{Cep, StreamOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed event record for the CEP gate query (top-level: kryo/product
  * encoders need a public, non-nested-in-class type).
  */
case class UEvent(userId: Long, eventId: Long, etype: String, tsMs: Long)

/** Third coverage batch — the reference's case-study jobs as oracle-gated
  * batch queries over the shared test tables:
  *
  *  - q51 ad-click blacklisting (reference
  *    scala/.../demo/market/AdClickAnalysis.scala:81-123: count threshold
  *    per (user, day), clean counts exclude blacklisted pairs)
  *  - q52 order-timeout CEP (reference
  *    scala/.../demo/orderpaydetect/OrderTimeoutWithCEP.scala:38-56:
  *    followedBy + within + timeout extraction) — runs the REAL
  *    Cep.detectBatch NFA and checks it against a relational oracle
  *  - q53 late-data tagging (reference sideOutputLateData,
  *    java/.../function/WindowLateDateDemo.java:45-56)
  *  - q54 two-phase salted aggregation (reference
  *    PageView.scala:48-59,106-109 — skew-proof keyless counting; the
  *    result is salt-invariant, which is exactly what the oracle checks)
  *  - q55 word count (reference scala/.../wc/StreamWordCount.scala:13-22)
  */
/** Spark-side SQL text for the streaming-adjacent gates' SQL twins
  * (q112/q113). Mirrors the DuckDB oracles modulo dialect: the views
  * registered by SqlSurface already carry the normalized `ts`, so no
  * `ev` CTE; `CAST(ts AS LONG)` is Spark's epoch-seconds idiom.
  */
object SqlStreamText {
  val lateTag: String =
    """WITH m AS (SELECT MAX(ts) AS mx FROM events)
      |SELECT event_type, ts < mx - INTERVAL 10 MINUTE AS is_late,
      |  COUNT(*) AS n
      |FROM events CROSS JOIN m
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val sessionGap: String =
    """WITH x AS (
      |  SELECT user_id, ts,
      |    ts + CASE WHEN event_type = 'view' THEN INTERVAL 10 MINUTE
      |              ELSE INTERVAL 30 MINUTE END AS e
      |  FROM events),
      |y AS (
      |  SELECT user_id, ts, e,
      |    MAX(e) OVER (PARTITION BY user_id ORDER BY ts
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prev_max_end
      |  FROM x),
      |z AS (
      |  SELECT *, CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
      |                 THEN 1 ELSE 0 END AS new_sess
      |  FROM y),
      |s AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                                ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM z)
      |SELECT user_id, CAST(MIN(ts) AS LONG) AS sess_start, COUNT(*) AS n
      |FROM s GROUP BY user_id, sid""".stripMargin
}

object PipelineQueries extends QueryModule {
  import Q._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Blacklist users clicking more than 2x per day; report per day the
    // clean click count and blacklisted-user count. Anti-join keyed on
    // (day, user) — both sides pre-aggregated, so the shuffle carries
    // groups, not raw clicks.
    "q51_blacklist" -> ((s, dir) => {
      import s.implicits._
      val clicks = Tables.events(s, dir).filter($"event_type" === "click")
        .withColumn("day", $"ts".cast("date"))
      val daily = clicks.groupBy($"day", $"user_id").agg(count(lit(1)).as("n"))
      val blacklist = daily.filter($"n" > 2)
      val clean = clicks.join(blacklist.select("day", "user_id"),
        Seq("day", "user_id"), "left_anti")
      val b = blacklist.groupBy($"day").agg(count(lit(1)).as("blacklisted_users"))
      val c = clean.groupBy($"day").agg(count(lit(1)).as("clean_clicks"))
      c.join(b, Seq("day"), "full_outer")
        .select($"day",
          coalesce($"clean_clicks", lit(0L)).as("clean_clicks"),
          coalesce($"blacklisted_users", lit(0L)).as("blacklisted_users"))
        .orderBy($"day")
    }),

    // CEP order-timeout: signup followedBy purchase within 1h per user;
    // unmatched signups surface as timeouts (the reference's
    // PatternTimeoutFunction side output). Exercises the NFA operator
    // end-to-end; the oracle is the equivalent relational spec (first
    // qualifying purchase per signup). All times in the ms domain —
    // (user, ms) is collision-free in the test data, so ordering is total.
    "q52_order_timeout_cep" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("signup", "purchase"))
        .select($"user_id".as("userId"), $"event_id".as("eventId"),
          $"event_type".as("etype"), expr("unix_micros(ts) div 1000").as("tsMs"))
        .as[UEvent]
      val pat = Cep.Pattern.begin[UEvent]("signup")(_.etype == "signup")
        .followedBy("purchase")(_.etype == "purchase")
        .within(3600000L)
      Cep.detectBatch(ev)(_.userId.toString, _.tsMs, pat,
          emitTimeouts = true, endOfInputTimeouts = true)
        .map(r => (r.key.toLong, r.events.head.eventId, r.kind, r.firstTs, r.lastTs))
        .toDF("user_id", "signup_id", "kind", "signup_ms", "end_ms")
    }),

    // Late-data tagging: rows older than (max event time - 10 min) are
    // tagged late — the batch analog of the watermark-lag side output.
    "q53_late_tag" -> ((s, dir) => {
      import s.implicits._
      StreamOps.tagLate(Tables.events(s, dir), "ts", "10 MINUTES")
        .groupBy($"event_type", $"is_late").agg(count(lit(1)).as("n"))
        .orderBy($"event_type", $"is_late")
    }),

    // Two-phase salted count per hour: phase 1 aggregates (window, salt)
    // partials, phase 2 merges — the all-to-one shuffle carries |salts|
    // rows per window instead of |events| (the reference's hand-salting,
    // same physics at 100 TB). Result is salt-invariant by construction.
    "q54_salted_agg" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Relational.saltedAgg(
          Tables.events(s, dir).filter($"event_type" === "view")
            .withColumn("window", window($"ts", "1 hour")),
          keyCols = Seq("window"), salts = 16,
          aggs = Seq(graft.operators.Relational.Salted("count", "*", "pv")))
        .select($"window.start".cast("long").as("w_start"), $"pv")
    }),

    // Pure range join (NO equality key) through the bucketed library
    // operator: purchases landing inside any "hot hour" promo interval
    // (hour with >= 2 views, padded 15 min both sides). Naive Spark plans
    // a nested-loop here; Relational.rangeJoin quantizes time to buckets
    // and equi-joins (RelationalSpec gates the plan).
    "q66_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val hot = ev.filter($"event_type" === "view")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("views"))
        .filter($"views" >= 2)
        .select(epochS($"w.start").as("h_start"),
          (epochS($"w.start") - 900).as("lo"),
          (epochS($"w.end") + 900).as("hi"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", epochS($"ts").as("t"))
      graft.operators.Relational.rangeJoin(purchases, hot, "t", "lo", "hi",
          bucketWidth = 3600)
        .groupBy($"r.h_start".as("h_start"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy($"h_start")
    }),

    // WordCount over the documents corpus (explode + groupBy; update mode
    // in the streaming form).
    "q55_wordcount" -> ((s, dir) =>
      graft.apps.CaseStudies.wordCount(
        Tables.documents(s, dir).select(col("text")), "text")),

    // Sliding count window through the gate (reference
    // Slide.over(rowInterval(10)).every(rowInterval(5)),
    // cn/ngt/day11/_06_GroupWindow_Count.java:40-50): fires at every 5th
    // record per user with the last <=10 records; checked against a
    // row_number + bounded-frame oracle. Exercises the CountWindows
    // library operator end-to-end.
    "q61_sliding_count_window" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id".as("userId"), $"event_id".as("eventId"),
          $"event_type".as("etype"), expr("unix_micros(ts) div 1000").as("tsMs"))
        .as[UEvent]
      graft.streaming.CountWindows
        .slidingBatch(ev)(_.userId.toString, _.tsMs, size = 10, slide = 5)
        .map(w => (w.key.toLong, w.windowSeq, w.events.size.toLong,
          w.events.map(_.eventId).min, w.events.map(_.eventId).max))(
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
        .toDF("user_id", "win_seq", "n", "min_event", "max_event")
    }),

    // HLL++ approximate distinct (the 100 TB form of the reference's
    // bloom/Redis-bitmap UV counting) checked the q43 way: the oracle
    // supplies exact + TRUE, the query asserts the estimate lands within
    // 5% (rsd 0.02 ≈ 2.5σ headroom).
    "q56_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx"),
          countDistinct($"user_id").as("exact_users"))
        .select($"event_type", $"exact_users",
          (abs($"approx" - $"exact_users") <=
            $"exact_users".cast("double") * 0.05).as("hll_ok"))
    }),

    // Deep join tree (TPC-H Q5 shape): two fact-fact shuffle joins
    // (lineitem⋈orders on orderkey, ⋈customer on custkey) with the
    // supplier co-nationality predicate and broadcast dim chain
    // (supplier/nation/region) — exercises Catalyst join ordering and
    // mixed broadcast/shuffle strategy under one plan.
    "q58_deep_join" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter($"r_name" === "ASIA" &&
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .groupBy($"n_name")
        .agg(dsum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"n_name")
    }),

    // Dynamic-gap session windows: view events extend the session only
    // 10 min, everything else 30 min (per-event gap expression — the
    // custom-WindowAssigner tier of the reference expressed declaratively).
    // Sessions merge while an event starts before the running max end.
    "q57_session_dynamic_gap" -> ((s, dir) => {
      import s.implicits._
      // session_window's dynamic-gap form takes duration strings
      val gap = when($"event_type" === "view", lit("10 minutes"))
        .otherwise(lit("30 minutes"))
      Tables.events(s, dir)
        .groupBy($"user_id", session_window($"ts", gap))
        .agg(count(lit(1)).as("n"))
        .select($"user_id",
          $"session_window.start".cast("long").as("sess_start"), $"n")
    }),

    // SQL-TEXT twin of q53 (Table/SQL parity, reference
    // cn/ngt/day10/_09_SQL_Test.java:33, day11/_07:59-75): the same
    // late-tagging semantics as spark.sql TEXT over the registered views
    // instead of the DataFrame API — the day10/day11 story where every
    // Table-API job also runs as SQL.
    "q112_late_tag_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql(SqlStreamText.lateTag)
    }),

    // SQL-TEXT twin of q57: dynamic-gap sessionization written as ANSI
    // window SQL (the declarative reconstruction the oracle also runs) —
    // the custom-WindowAssigner tier through the pure SQL surface.
    "q113_session_gap_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql(SqlStreamText.sessionGap)
    })
  )

  override def oracles: Map[String, String] = Map(
    "q51_blacklist" ->
      s"""WITH $eventsUs,
         |clicks AS (
         |  SELECT CAST(ts AS DATE) AS day, user_id FROM ev
         |  WHERE event_type = 'click'),
         |daily AS (SELECT day, user_id, COUNT(*) AS n FROM clicks GROUP BY 1, 2),
         |bl AS (SELECT day, user_id FROM daily WHERE n > 2),
         |clean AS (
         |  SELECT c.day FROM clicks c LEFT JOIN bl
         |    ON c.day = bl.day AND c.user_id = bl.user_id
         |  WHERE bl.user_id IS NULL),
         |b AS (SELECT day, COUNT(*) AS blacklisted_users FROM bl GROUP BY day),
         |c2 AS (SELECT day, COUNT(*) AS clean_clicks FROM clean GROUP BY day)
         |SELECT COALESCE(c2.day, b.day) AS day,
         |  COALESCE(clean_clicks, 0) AS clean_clicks,
         |  COALESCE(blacklisted_users, 0) AS blacklisted_users
         |FROM c2 FULL OUTER JOIN b ON c2.day = b.day
         |ORDER BY day""".stripMargin,

    "q52_order_timeout_cep" ->
      s"""WITH $eventsUs,
         |su AS (
         |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS tms FROM ev
         |  WHERE event_type = 'signup'),
         |pu AS (
         |  SELECT user_id, epoch_us(ts) // 1000 AS tms FROM ev
         |  WHERE event_type = 'purchase'),
         |m AS (
         |  SELECT s.user_id, s.event_id AS signup_id, s.tms AS signup_ms,
         |    MIN(p.tms) AS pms
         |  FROM su s LEFT JOIN pu p
         |    ON s.user_id = p.user_id AND p.tms > s.tms
         |   AND p.tms - s.tms <= 3600000
         |  GROUP BY 1, 2, 3)
         |SELECT user_id, signup_id,
         |  CASE WHEN pms IS NOT NULL THEN 'match' ELSE 'timeout' END AS kind,
         |  signup_ms, COALESCE(pms, signup_ms) AS end_ms
         |FROM m""".stripMargin,

    "q53_late_tag" ->
      s"""WITH $eventsUs,
         |m AS (SELECT MAX(ts) AS mx FROM ev)
         |SELECT event_type, ts < mx - INTERVAL 10 MINUTE AS is_late,
         |  COUNT(*) AS n
         |FROM ev CROSS JOIN m
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q54_salted_agg" ->
      s"""WITH $eventsUs
         |SELECT (epoch_us(ts) // 3600000000) * 3600 AS w_start, COUNT(*) AS pv
         |FROM ev WHERE event_type = 'view' GROUP BY 1""".stripMargin,

    "q66_range_join" ->
      s"""WITH $eventsUs,
         |hot AS (
         |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS h_start
         |  FROM ev WHERE event_type = 'view'
         |  GROUP BY 1 HAVING COUNT(*) >= 2),
         |p AS (SELECT epoch_us(ts) // 1000000 AS t FROM ev
         |      WHERE event_type = 'purchase')
         |SELECT h.h_start, COUNT(*) AS n_purchases
         |FROM hot h JOIN p
         |  ON p.t >= h.h_start - 900 AND p.t <= h.h_start + 4500
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q55_wordcount" ->
      """SELECT t AS word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents)
        |WHERE len(t) > 0 GROUP BY t""".stripMargin,

    "q56_approx_distinct" ->
      s"""WITH $eventsUs
         |SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
         |  TRUE AS hll_ok
         |FROM ev GROUP BY event_type""".stripMargin,

    "q61_sliding_count_window" ->
      s"""WITH $eventsUs,
         |numbered AS (
         |  SELECT user_id, event_id,
         |    row_number() OVER w AS rn,
         |    COUNT(*) OVER f AS n,
         |    MIN(event_id) OVER f AS min_event,
         |    MAX(event_id) OVER f AS max_event
         |  FROM ev
         |  WINDOW
         |    w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000),
         |    f AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000
         |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         |SELECT user_id, rn // 5 - 1 AS win_seq, n, min_event, max_event
         |FROM numbered WHERE rn % 5 = 0""".stripMargin,

    "q58_deep_join" ->
      s"""SELECT n_name,
         |  ${oSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // Dynamic-gap sessionization: an event extends the session iff it
    // starts before the running MAX of (ts + its gap) over prior events.
    "q57_session_dynamic_gap" ->
      s"""WITH $eventsUs,
         |x AS (
         |  SELECT user_id, ts,
         |    ts + CASE WHEN event_type = 'view' THEN INTERVAL 10 MINUTE
         |              ELSE INTERVAL 30 MINUTE END AS e
         |  FROM ev),
         |y AS (
         |  SELECT user_id, ts, e,
         |    MAX(e) OVER (PARTITION BY user_id ORDER BY ts
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev_max_end
         |  FROM x),
         |z AS (
         |  SELECT *, CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM y),
         |s AS (
         |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |                                ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM z)
         |SELECT user_id, epoch_us(MIN(ts)) // 1000000 AS sess_start,
         |  COUNT(*) AS n
         |FROM s GROUP BY user_id, sid""".stripMargin,

    // SQL twins verify against the SAME oracles as their DataFrame
    // originals — identical semantics, two front-end surfaces
    "q112_late_tag_sql" ->
      s"""WITH $eventsUs,
         |m AS (SELECT MAX(ts) AS mx FROM ev)
         |SELECT event_type, ts < mx - INTERVAL 10 MINUTE AS is_late,
         |  COUNT(*) AS n
         |FROM ev CROSS JOIN m
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q113_session_gap_sql" ->
      s"""WITH $eventsUs,
         |x AS (
         |  SELECT user_id, ts,
         |    ts + CASE WHEN event_type = 'view' THEN INTERVAL 10 MINUTE
         |              ELSE INTERVAL 30 MINUTE END AS e
         |  FROM ev),
         |y AS (
         |  SELECT user_id, ts, e,
         |    MAX(e) OVER (PARTITION BY user_id ORDER BY ts
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev_max_end
         |  FROM x),
         |z AS (
         |  SELECT *, CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM y),
         |s AS (
         |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |                                ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM z)
         |SELECT user_id, epoch_us(MIN(ts)) // 1000000 AS sess_start,
         |  COUNT(*) AS n
         |FROM s GROUP BY user_id, sid""".stripMargin
  )
}
