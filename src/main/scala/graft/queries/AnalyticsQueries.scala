package graft.queries

import graft.Tables
import graft.operators.{Quality, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytics-surface tier (rounds 12–13): the multi-dimensional
  * reporting machinery a corpus dashboard sits on — ROLLUP cubes
  * (doc/token sums AND distinct-user cardinalities), pivot/unpivot
  * reshaping, winsorized robust stats (exact + oracle-gated sketch
  * tier), RANGE-frame moving windows, exact integer moment sums (the
  * distributed half of correlation), funnels (greedy AND
  * per-step-windowed), retention cohorts, and last-touch attribution —
  * with the retention/attribution/cube queries doubled through the pure
  * SQL-text catalog surface. Mostly Spark built-ins used declaratively
  * (Catalyst expands rollup grouping sets and pivots into single-pass
  * aggregates) — the point is the plan shape: one scan + one or two
  * partial-aggregated shuffles at any scale, |users|-bounded
  * intermediates for the event funnels.
  */
object AnalyticsQueries extends QueryModule {

  /** Whitespace token count, SQL-twin semantics both engines share
    * (`len(string_split_regex(trim(text), '\s+'))`). */
  private def nTokens = size(split(trim(col("text")), "\\s+")).cast("long")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token-accounting cube: doc and token totals by (source, lang) with
    // ROLLUP subtotals — the "how much of each language does each source
    // contribute, and overall" planning table every mixture decision
    // reads. Catalyst expands the rollup into ONE Expand + one aggregate
    // (map-side partial over 3x the rows, grouping-set key): a single
    // shuffle at 100 TB, not three passes.
    "q157_token_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"source", $"lang", nTokens.as("nt"), $"n_chars")
        .rollup($"source", $"lang")
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_docs"),
          sum($"nt").as("n_tokens"),
          sum($"n_chars".cast("long")).as("n_chars"))
        .orderBy($"gid", $"source", $"lang")
    }),

    // Language-mix pivot: one row per source, one doc-count column per
    // language — the wide corpus-composition report. An EXPLICIT value
    // list keeps pivot single-pass (no distinct-scan job) and fixes the
    // output schema; Catalyst compiles it to one aggregate with
    // conditional counts — one shuffle on source.
    "q158_lang_pivot" -> ((s, dir) => {
      import s.implicits._
      val langs = Seq("de", "en", "es", "fr", "zh")
      val wide = Tables.documents(s, dir)
        .groupBy($"source")
        .pivot("lang", langs)
        .agg(count(lit(1)))
      langs.foldLeft(wide)((df, l) =>
          df.withColumn(l, coalesce(col(l), lit(0L))))
        .orderBy($"source")
    }),

    // Unpivot (melt): the same per-source totals as a long (source,
    // metric, value) table — the shape dashboards and metric stores
    // ingest. Spark's native unpivot is a zero-shuffle Expand over the
    // aggregated rows; the only shuffle is the upstream groupBy.
    "q159_metrics_unpivot" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars".cast("long")).as("n_chars"),
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("n_en"))
        .unpivot(Array($"source"), Array($"n_docs", $"n_chars", $"n_en"),
          "metric", "value")
        .orderBy($"source", $"metric")
    }),

    // Winsorized length stats per source: exact p05/p95 order-statistic
    // thresholds, outliers clamped, raw vs clamped sums — the robust
    // "is this source's length distribution broken" check that a mean
    // alone can't answer. Integer-exact end to end (no percentile
    // interpolation); windows are partitioned by source, never global.
    "q160_winsorized_len" -> ((s, dir) => {
      import s.implicits._
      Relational.winsorizedStats(Tables.documents(s, dir),
        "source", "n_chars", "doc_id", pLoPct = 5, pHiPct = 95)
        .orderBy($"source")
    }),

    // 7-day moving revenue window per event type: daily exact-decimal
    // totals, then a RANGE frame (6 preceding days .. current) over the
    // DAY-NUMBER ordering — value-range frames handle calendar gaps
    // correctly where ROWS frames silently don't. Two shuffles total
    // (daily rollup, then window keyed by event_type over ~days rows).
    "q161_moving_window" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day_num")
        .rangeBetween(-6, 0)
      Tables.events(s, dir)
        .select($"event_type",
          datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("day_num"),
          $"value")
        .groupBy($"event_type", $"day_num")
        .agg(Q.dec2(sum(Q.dec2($"value"))).as("day_total"))
        .select($"event_type", $"day_num",
          $"day_total".cast("double").as("day_total"),
          sum($"day_total").over(w).cast("double").as("win_total"),
          count(lit(1)).over(w).as("win_days"))
        .orderBy($"event_type", $"day_num")
    }),

    // Exact second-moment sums between doc length and token count per
    // source — the distributed half of Pearson correlation, kept BIGINT
    // so the gate is engine-exact; the float corr finish is model-sized
    // arithmetic on six numbers per group (Pca.gramianMicro discipline).
    "q162_corr_moments" -> ((s, dir) => {
      import s.implicits._
      Quality.momentSums(
        Tables.documents(s, dir).select($"source",
          $"n_chars".cast("long").as("x"), nTokens.as("y")),
        "source", "x", "y")
        .orderBy($"source")
    }),

    // Ordered conversion funnel (view -> click -> purchase, strict
    // event-time order per user): each step's reach is the count of
    // users whose step-k event strictly follows their step-(k-1) first
    // completion. Three user-keyed conditional-min aggregates chained by
    // uniform-key joins — no window over raw events, no per-user sort;
    // every stage reduces to |users| rows before the next touches it.
    "q165_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
      val t1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val t2 = ev.filter($"event_type" === "click").join(t1, Seq("user_id"))
        .filter($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
      val t3 = ev.filter($"event_type" === "purchase").join(t2, Seq("user_id"))
        .filter($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
      def c(step: Long, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(step).as("step"), lit(name).as("step_name"), $"n_users")
      c(1L, "view", t1).unionAll(c(2L, "click", t2))
        .unionAll(c(3L, "purchase", t3))
        .orderBy($"step")
    }),

    // Retention cohort triangle: cohort = a user's first active day,
    // cell (cohort_day, offset) = distinct users active `offset` days
    // later (offsets 0-7). The (user, day) activity table is distinct
    // BEFORE anything joins, so the triangle aggregates |users|·|days|
    // rows at most — never raw events. `Retention.maintainActivity` is
    // the streaming twin: the monotone activity set accrues
    // incrementally, the same `triangle` finisher runs over the store
    // (StreamingAppsSpec pins store+finisher == this batch form).
    "q166_retention" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Retention.triangle(
        graft.operators.Retention.activity(
          Tables.events(s, dir), "user_id", "ts"), maxOffset = 7)
        .orderBy($"cohort_day", $"day_offset")
    }),

    // Last-touch attribution: each purchase matched to the SAME user's
    // latest click at-or-before it (`Relational.asOfJoin` — one keyed
    // shuffle, zero pair explosion), attributed when the click is
    // within a 3-day lookback (exact floor-epoch seconds both engines
    // share). Daily report: purchases vs attributed.
    "q167_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id", $"ts")
      Relational.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        tieBreak = Seq("event_id"))
        .select(
          datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("day_num"),
          ($"asof".isNotNull &&
            ($"ts".cast("long") - $"asof.ts".cast("long") <= 259200L)).as("att"))
        .groupBy($"day_num")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when($"att", 1L).otherwise(0L)).as("n_attributed"))
        .orderBy($"day_num")
    }),

    // The q157 ROLLUP cube through the PURE SQL-TEXT surface (the
    // reference's catalog-and-SQL-strings entry point): registered
    // views + one SQL string, same single-Expand plan Catalyst builds
    // for the DataFrame form.
    "q168_cube_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql("""SELECT source, lang, grouping_id() AS gid,
              |  count(*) AS n_docs,
              |  CAST(sum(size(split(trim(text), '\\s+'))) AS BIGINT)
              |    AS n_tokens
              |FROM documents GROUP BY ROLLUP(source, lang)
              |ORDER BY gid, source, lang""".stripMargin)
    }),

    // q160's winsorize in its 100 TB form, oracle-gated in its own
    // right (the q137→q141 evidence precedent): thresholds from the
    // per-source histogram (width-4 grid over [0, 16384) — deliberately
    // NOT unit-width, so the gate exercises the sketch's own
    // bucket-lower-bound semantics, not the exact order statistics),
    // clamp+sum map-only. No corpus row is ever sorted.
    "q170_winsorized_sketch" -> ((s, dir) => {
      import s.implicits._
      Relational.winsorizedStatsBySketch(Tables.documents(s, dir),
        "source", "n_chars", pLoPct = 5, pHiPct = 95,
        lo = 0L, width = 4L, nBuckets = 4096)
        .orderBy($"source")
    }),

    // Windowed conversion funnel (view -> click -> purchase, each step
    // within 3 days of a REACHING previous-step event): per-user valid-
    // set reachability via Funnel.reachedSteps — greedy first-completion
    // (q165's unwindowed shape) is wrong under a window, since a later
    // step-1 event can convert where the earliest can't (FunnelSpec pins
    // a divergence case). One user-keyed shuffle, |users| rows out, one
    // pass to the 3-row report.
    "q171_windowed_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Funnel.reachedSteps(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowUs = 259200L * 1000000L)
        .agg(sum(when($"n_steps" >= 1, 1L).otherwise(0L)).as("s1"),
          sum(when($"n_steps" >= 2, 1L).otherwise(0L)).as("s2"),
          sum(when($"n_steps" >= 3, 1L).otherwise(0L)).as("s3"))
        .selectExpr("stack(3, CAST(1 AS BIGINT), 'view', s1, " +
          "CAST(2 AS BIGINT), 'click', s2, " +
          "CAST(3 AS BIGINT), 'purchase', s3) AS (step, step_name, n_users)")
        .orderBy($"step")
    }),

    // Distinct-cardinality ROLLUP cube: events by (event_type, day) with
    // subtotal and grand-total rows counting DISTINCT users — the
    // dashboard shape q157's doc/token sums can't give (distinct doesn't
    // add across cells). This exact tier carries each distinct
    // (type, day, user) triple through one Expand + dedup-aggregate;
    // `Sketches.distinctRollup` is the shipped mergeable-HLL production
    // twin (SketchesSpec pins estimate == exact per grouping set at
    // test-scale coupon cardinalities).
    "q172_distinct_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type",
          datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("day_num"),
          $"user_id")
        .rollup($"event_type", $"day_num")
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"gid", $"event_type", $"day_num")
    }),

    // q166's retention triangle through the PURE SQL-TEXT surface (the
    // q168 discipline: registered views + one SQL string an analyst
    // would actually type; same |users|-bounded plan).
    "q173_retention_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql("""WITH act AS (
              |  SELECT DISTINCT user_id,
              |    CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)
              |      AS day
              |  FROM events),
              |cohort AS (
              |  SELECT user_id, MIN(day) AS cohort_day FROM act
              |  GROUP BY user_id)
              |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
              |  COUNT(*) AS n_users
              |FROM act a JOIN cohort c ON a.user_id = c.user_id
              |WHERE a.day - c.cohort_day <= 7
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    }),

    // Conversion latency per funnel step: for users reaching step k
    // (windowed valid-set semantics, q171), time from their FIRST view
    // to their EARLIEST VALID step-k event — the funnel's "how long does
    // conversion take" report. min R_k is well-defined under valid-set
    // reachability (greedy "first completion" isn't: it depends on which
    // earlier choice was taken); exact BIGINT µs end to end. Every step
    // emits a row even with ZERO reaching users (n_users=0, NULL sums) —
    // the oracle's scalar aggregates always produce one row per step, so
    // the groupBy left-joins onto the literal step frame to match.
    "q175_funnel_latency" -> ((s, dir) => {
      import s.implicits._
      val agg = graft.operators.Funnel.reachedTimes(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowUs = 259200L * 1000000L)
        .filter($"n_steps" >= 2)
        .withColumn("step", explode(sequence(lit(2L), $"n_steps")))
        .withColumn("lat_us", element_at($"step_us", $"step".cast("int")) -
          element_at($"step_us", lit(1)))
        .groupBy($"step")
        .agg(count(lit(1)).as("n_users"),
          sum($"lat_us").as("sum_latency_us"),
          max($"lat_us").as("max_latency_us"))
      s.range(2, 4).select($"id".as("step"))
        .join(agg, Seq("step"), "left")
        .select($"step", coalesce($"n_users", lit(0L)).as("n_users"),
          $"sum_latency_us", $"max_latency_us")
        .orderBy($"step")
    }),

    // The q172 cube's SHIPPED production tier, oracle-gated in its own
    // right (the q141/q170 sketch-gate discipline): mergeable HLL per
    // grouping set. At the gate's cardinalities (≤ |users| distinct per
    // cell) the DataSketches HLL sits in exact coupon mode, so DuckDB's
    // exact COUNT(DISTINCT) IS the oracle — the q125/q126 coupon-
    // exactness precedent lifted through ROLLUP's Expand.
    // BOUNDARY (measured, round-16 sf0.1 sweep): coupon-exactness holds
    // at the driver's gate scales (sf0.001/sf0.01); at sf0.1 the
    // largest cells (~500+ distinct users) leave coupon range and the
    // estimate departs by DESIGN (±1%, e.g. 500 vs 505) — that is the
    // estimator doing its job, not an oracle defect. Same boundary
    // applies to q180 (merge) and q185 (sliding union). The oracle
    // contract for all three is the gate scale.
    "q179_distinct_cube_hll" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sketches.distinctRollup(
        Tables.events(s, dir)
          .select($"event_type",
            datediff(to_date($"ts"), lit("1970-01-01")).cast("long")
              .as("day_num"),
            $"user_id"),
        Seq("event_type", "day_num"), "user_id")
        .select($"event_type", $"day_num", $"gid", $"n_rows",
          $"distinct_est")
        .orderBy($"gid", $"event_type", $"day_num")
    }),

    // Incremental cube maintenance gated end to end: the corpus splits
    // into two event batches (id parity), each builds ITS OWN cube, and
    // `mergeDistinctRollups` unions them register-wise per grouping set
    // — the oracle recomputes the whole cube exactly over ALL events, so
    // the gate proves merge(batch cubes) == cube(union) with users
    // OVERLAPPING across batches (counts may NOT add; distincts must
    // union). This is the dashboard's nightly update contract.
    "q180_cube_merge" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"event_type",
          datediff(to_date($"ts"), lit("1970-01-01")).cast("long")
            .as("day_num"),
          $"user_id")
      def cube(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Sketches.distinctRollup(df,
          Seq("event_type", "day_num"), "user_id")
      graft.operators.Sketches.mergeDistinctRollups(
        cube(ev.filter($"event_id" % 2 === 0)),
        cube(ev.filter($"event_id" % 2 =!= 0)),
        Seq("event_type", "day_num"))
        .select($"event_type", $"day_num", $"gid", $"n_rows",
          $"distinct_est")
        .orderBy($"gid", $"event_type", $"day_num")
    }),

    // A/B experiment report: population = users with a signup; variant =
    // parity of the k prop on the user's FIRST signup (min ts, event_id
    // tie-break — the deterministic assignment record); converted =
    // some purchase strictly after that signup. Per variant: users,
    // conversions, exact micro-unit conversion rate. Everything after
    // the first-signup reduction is |users|-bounded.
    // Operator form (`Experiment`): per-user CRDT aggregates — min
    // first-signup struct, max purchase time — then the report
    // finisher; `converted = p_max > s_ts` is exactly "some purchase
    // strictly after the first signup". Same decomposition the
    // streaming twin maintains incrementally (StreamingAppsSpec pins
    // the twin equality, late re-assigning signups included).
    "q176_ab_report" -> ((s, dir) => {
      graft.operators.Experiment.abReport(
        graft.operators.Experiment.userAggregates(Tables.events(s, dir),
          "user_id", "event_type", "ts", "event_id", "props"))
    }),

    // Daily anomaly flags per event type: today's count vs the TRAILING
    // 7 days (RANGE frame -7..-1 over day numbers — calendar-gap-correct
    // and never self-including), flagged when |n − mean| > 2σ. The
    // whole test is ONE integer inequality — (7n − Σx)² > 4(7Σx² − (Σx)²)
    // clears both /7 and the sqrt — so the flag is engine-exact with no
    // float σ anywhere. Rows with fewer than 7 trailing days carry no
    // verdict (flag null): a z-test against a partial week is noise.
    // Operator form (`Anomaly`): the daily rollup + the z-test
    // finisher — the same decomposition whose streaming twin maintains
    // the additive count store and re-derives flags on demand
    // (StreamingAppsSpec pins the twin equality under late events).
    "q177_daily_anomaly" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Anomaly.anomalyFlags(
        graft.operators.Anomaly.dailyCounts(Tables.events(s, dir),
          "event_type", "ts"))
        .orderBy($"event_type", $"day_num")
    }),

    // Lag-gap sessionization (the batch mirror of the q14/q57 session
    // windows): a user's events split where the gap to the previous
    // event exceeds 30 min; report sessions and exact total duration by
    // session size. Two windows + the rollups, ALL partitioned by user
    // then session — nothing global, µs-exact arithmetic.
    "q178_session_stats" -> ((s, dir) => {
      import s.implicits._
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"us", $"event_id")
      val ev = Tables.events(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        .withColumn("new_s",
          when(lag($"us", 1).over(wOrd).isNull ||
            $"us" - lag($"us", 1).over(wOrd) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"new_s").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"us", $"event_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      ev.groupBy($"user_id", $"sid")
        .agg(count(lit(1)).as("n_events"),
          (max($"us") - min($"us")).as("dur_us"))
        .groupBy($"n_events")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"dur_us").as("sum_dur_us"))
        .orderBy($"n_events")
    }),

    // q167's last-touch attribution as pure SQL text — the asOfJoin
    // re-expressed as the running-max window every SQL engine plans the
    // same way: clicks and purchases interleave per user ordered by
    // (ts, clicks-first on ties, matching at-or-before), and the latest
    // click at-or-before each purchase is the running MAX over the
    // preceding frame. One user-keyed window shuffle, zero pair
    // explosion — the same scale shape as the DataFrame form.
    "q174_attribution_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql("""WITH m AS (
              |  SELECT user_id, ts, event_type,
              |    MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
              |      PARTITION BY user_id
              |      ORDER BY ts, CASE WHEN event_type = 'click' THEN 0
              |                        ELSE 1 END
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS last_click
              |  FROM events WHERE event_type IN ('click', 'purchase'))
              |SELECT
              |  CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)
              |    AS day_num,
              |  COUNT(*) AS n_purchases,
              |  SUM(CASE WHEN last_click IS NOT NULL
              |    AND CAST(ts AS BIGINT) - CAST(last_click AS BIGINT)
              |      <= 259200 THEN 1 ELSE 0 END) AS n_attributed
              |FROM m WHERE event_type = 'purchase'
              |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // q171's windowed valid-set funnel through the PURE SQL-TEXT
    // surface (the q173/q174 discipline) — analysts type funnels in
    // SQL, and the valid-set semantics is directly expressible as
    // EXISTS chains: a click is funnel-valid iff SOME view precedes it
    // within the window, a purchase converts iff SOME VALID click does.
    // Catalyst plans each EXISTS as a user-keyed left-semi join that
    // stops at the first match — no pair set is ever materialized, and
    // nothing here is per-user quadratic in output. Gates against the
    // SAME oracle as q171: one semantics, two entry points.
    "q181_funnel_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql("""WITH v AS (
              |  SELECT user_id, ts FROM events WHERE event_type = 'view'),
              |vc AS (
              |  SELECT DISTINCT user_id, ts FROM events c
              |  WHERE event_type = 'click' AND EXISTS (
              |    SELECT 1 FROM v WHERE v.user_id = c.user_id
              |      AND v.ts < c.ts AND c.ts <= v.ts + INTERVAL 3 DAY)),
              |vp AS (
              |  SELECT DISTINCT user_id FROM events p
              |  WHERE event_type = 'purchase' AND EXISTS (
              |    SELECT 1 FROM vc WHERE vc.user_id = p.user_id
              |      AND vc.ts < p.ts AND p.ts <= vc.ts + INTERVAL 3 DAY))
              |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
              |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM v
              |UNION ALL
              |SELECT 2, 'click', COUNT(DISTINCT user_id) FROM vc
              |UNION ALL
              |SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM vp
              |ORDER BY step""".stripMargin)
    }),

    // Two-proportion z-test verdict over the A/B report — the q177
    // integer-inequality discipline extended to two samples:
    // z² > 1.96² ⟺ 625·(c0·n1−c1·n0)²·N > 2401·n0·n1·C·(N−C), all
    // integer (1.96² = 2401/625 exactly), evaluated in DECIMAL(38,0)
    // and replayed by the oracle in HUGEINT. SE=0 edges (empty arm,
    // pooled rate 0 or 1) carry a null verdict. One row out, row-local
    // after q176's |users|-bounded report.
    "q182_ab_significance" -> ((s, dir) => {
      graft.operators.Experiment.significance(
        graft.operators.Experiment.abReport(
          graft.operators.Experiment.userAggregates(Tables.events(s, dir),
            "user_id", "event_type", "ts", "event_id", "props")))
    }),

    // DAU/WAU stickiness, exact tier: per observed day, distinct active
    // users that day vs the trailing 7 days (a user active on 5 of the
    // 7 counts ONCE — distinct union, which no additive window can
    // give), stickiness = dau/wau in exact micro units. The trailing
    // union is the contribution trick: each activity row explodes to
    // the ≤7 target days it serves, pruned to observed days — bounded
    // by 7·|activity| (≤ 7·|users|·|days|), never by event volume.
    // q185 is the mergeable-HLL production twin.
    "q184_dau_wau" -> ((s, dir) => {
      import s.implicits._
      val act = Tables.events(s, dir)
        .select($"user_id",
          datediff(to_date($"ts"), lit("1970-01-01")).cast("long")
            .as("day_num"))
        .distinct()
      val days = act.select($"day_num").distinct()
      val dau = act.groupBy($"day_num").agg(count(lit(1)).as("dau"))
      val wau = act
        .select($"user_id",
          explode(sequence($"day_num", $"day_num" + 6L)).as("day_num"))
        .join(days, Seq("day_num"))
        .distinct()
        .groupBy($"day_num").agg(count(lit(1)).as("wau"))
      val a = $"dau" * 1000000L
      dau.join(wau, Seq("day_num"))
        .withColumn("stickiness_micro",
          floor((a - pmod(a, $"wau")).cast("double") /
            $"wau".cast("double") + 0.5).cast("long"))
        .orderBy($"day_num")
    }),

    // q184's 100 TB form: daily HLL sketches once, then the trailing
    // window is a register-wise UNION over |days|·7 KB-sized sketch
    // rows (`Sketches.slidingDistinctUnion`) — raw membership never
    // reappears after the daily aggregate, so the dashboard recomputes
    // from sketches whatever the event volume. Coupon-exact at gate
    // cardinalities (the q179 discipline on the same user domain), so
    // the exact oracle gates it cell for cell.
    "q185_dau_wau_sketch" -> ((s, dir) => {
      import s.implicits._
      val byDay = Tables.events(s, dir)
        .select(datediff(to_date($"ts"), lit("1970-01-01")).cast("long")
          .as("day_num"), $"user_id")
      val daily = graft.operators.Sketches.distinctSketch(
        byDay, "day_num", "user_id")
      val dau = graft.operators.Sketches.estimate(daily)
        .select($"day_num", $"distinct_est".cast("long").as("dau"))
      val wau = graft.operators.Sketches.slidingDistinctUnion(
          daily, "day_num", window = 7)
        .select($"day_num", $"window_est".as("wau"))
      val a = $"dau" * 1000000L
      dau.join(wau, Seq("day_num"))
        .withColumn("stickiness_micro",
          floor((a - pmod(a, $"wau")).cast("double") /
            $"wau".cast("double") + 0.5).cast("long"))
        .orderBy($"day_num")
    }),

    // Markov next-event transition matrix (the product-analytics "what
    // do users do after X" view): per user in (ts, event_id) order,
    // count (prev → next) steps and the per-prev transition probability
    // in exact floor-division micro units. One user-keyed window (LAG)
    // + one pair aggregate — nothing global, the matrix is
    // |types|²-bounded however many events feed it.
    "q186_transition_matrix" -> ((s, dir) => {
      import s.implicits._
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val steps = Tables.events(s, dir)
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(wOrd))
        .filter($"prev".isNotNull)
        .groupBy($"prev", $"event_type".as("next"))
        .agg(count(lit(1)).as("n"))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy($"prev")
      val a = $"n" * 1000000L
      steps
        .withColumn("n_from", sum($"n").over(wPrev))
        .withColumn("p_micro",
          floor((a - pmod(a, $"n_from")).cast("double") /
            $"n_from".cast("double") + 0.5).cast("long"))
        .orderBy($"prev", $"next")
    }),

    // q175's latency report through the PURE SQL-TEXT surface (the
    // q181 discipline): valid-set CTEs + per-user MIN step times +
    // scalar aggregates per step — unix_micros is DuckDB's epoch_us,
    // so the µs arithmetic is shared verbatim. Same oracle as q175.
    "q187_funnel_latency_sql" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql("""WITH v AS (
              |  SELECT user_id, ts FROM events WHERE event_type = 'view'),
              |vc AS (
              |  SELECT DISTINCT user_id, ts FROM events c
              |  WHERE event_type = 'click' AND EXISTS (
              |    SELECT 1 FROM v WHERE v.user_id = c.user_id
              |      AND v.ts < c.ts AND c.ts <= v.ts + INTERVAL 3 DAY)),
              |vp AS (
              |  SELECT DISTINCT user_id, ts FROM events p
              |  WHERE event_type = 'purchase' AND EXISTS (
              |    SELECT 1 FROM vc WHERE vc.user_id = p.user_id
              |      AND vc.ts < p.ts AND p.ts <= vc.ts + INTERVAL 3 DAY)),
              |t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM v GROUP BY 1),
              |t2 AS (SELECT user_id, MIN(ts) AS ts2 FROM vc GROUP BY 1),
              |t3 AS (SELECT user_id, MIN(ts) AS ts3 FROM vp GROUP BY 1)
              |SELECT CAST(2 AS BIGINT) AS step, COUNT(*) AS n_users,
              |  CAST(SUM(unix_micros(ts2) - unix_micros(ts1)) AS BIGINT)
              |    AS sum_latency_us,
              |  CAST(MAX(unix_micros(ts2) - unix_micros(ts1)) AS BIGINT)
              |    AS max_latency_us
              |FROM t2 JOIN t1 USING (user_id)
              |UNION ALL
              |SELECT 3, COUNT(*),
              |  CAST(SUM(unix_micros(ts3) - unix_micros(ts1)) AS BIGINT),
              |  CAST(MAX(unix_micros(ts3) - unix_micros(ts1)) AS BIGINT)
              |FROM t3 JOIN t1 USING (user_id)
              |ORDER BY step""".stripMargin)
    }),

    // Linear (multi-touch) attribution — q167's last-touch complement:
    // EVERY click within the 3-day lookback at-or-before a purchase
    // shares the purchase's credit equally (1e6 // k micro units, exact
    // floor division), reported by the CLICK's day — the marketing view
    // of which day's clicks earned conversions. The user-keyed pair
    // join is bounded by per-user clicks×purchases inside the lookback
    // (inherent to multi-touch semantics — last-touch avoids it via
    // asOfJoin, which is exactly why both tiers exist); everything
    // after is |pairs|-bounded.
    "q188_linear_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"),
          unix_micros($"ts").as("p_us"))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"), unix_micros($"ts").as("c_us"))
      val pairs = p.join(c, Seq("user_id"))
        .filter($"c_us" <= $"p_us" &&
          $"p_us" - $"c_us" <= 259200L * 1000000L)
      val wP = org.apache.spark.sql.expressions.Window.partitionBy($"p_id")
      val a = lit(1000000L)
      pairs
        .withColumn("k", count(lit(1)).over(wP))
        .withColumn("credit_micro",
          floor((a - pmod(a, $"k")).cast("double") /
            $"k".cast("double") + 0.5).cast("long"))
        .groupBy(datediff(to_date($"c_ts"), lit("1970-01-01")).cast("long")
          .as("day_num"))
        .agg(count(lit(1)).as("n_clicks_credited"),
          countDistinct($"p_id").as("n_purchases_touched"),
          sum($"credit_micro").as("sum_credit_micro"))
        .orderBy($"day_num")
    }),

    // Time-DECAY multi-touch attribution (q188's third tier, closing
    // the marketing trio: last-touch q168 / linear q188 / decay here):
    // a click d full days before its purchase weighs 2^(3−d) — halving
    // per day over the 3-day lookback — and the weights are EXACT
    // INTEGERS (1,2,4,8), so each click's credit is the exact floor
    // division 1e6·w // W with W the purchase's weight sum. Same pair
    // bound as q188; everything after is |pairs|-bounded.
    "q195_decay_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"),
          unix_micros($"ts").as("p_us"))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"), unix_micros($"ts").as("c_us"))
      val pairs = p.join(c, Seq("user_id"))
        .filter($"c_us" <= $"p_us" &&
          $"p_us" - $"c_us" <= 259200L * 1000000L)
      val wP = org.apache.spark.sql.expressions.Window.partitionBy($"p_id")
      pairs
        .withColumn("d", expr("(p_us - c_us) div 86400000000"))
        .withColumn("w", expr("shiftleft(1L, cast(3 - d as int))"))
        .withColumn("wsum", sum($"w").over(wP))
        .withColumn("num", $"w" * lit(1000000L))
        .withColumn("credit_micro",
          floor(($"num" - pmod($"num", $"wsum")).cast("double") /
            $"wsum".cast("double") + 0.5).cast("long"))
        .groupBy(datediff(to_date($"c_ts"), lit("1970-01-01")).cast("long")
          .as("day_num"))
        .agg(count(lit(1)).as("n_clicks_credited"),
          countDistinct($"p_id").as("n_purchases_touched"),
          sum($"credit_micro").as("sum_credit_micro"))
        .orderBy($"day_num")
    }),

    // Join-skew diagnostics (`Relational.skewReport`) — the report to
    // run BEFORE a big join to size salting: top-5 hottest documents
    // languages with exact integer share and uniform-skew factors
    // (skew_micro = n·|keys|·1e6 div total; 1e6 = perfectly uniform).
    // One count aggregate over the data; totals are a 1-row broadcast;
    // the rank window sees only the k retained rows.
    "q189_skew_report" -> ((s, dir) => {
      graft.operators.Relational.skewReport(
        Tables.documents(s, dir), "lang", k = 5)
    })
  )

  /** Exact DAU/WAU per observed day: trailing-7-day DISTINCT union via
    * a range join over the activity set, floor-division micro
    * stickiness. Gates both the exact tier (q184) and the HLL sliding
    * union (q185).
    */
  private def dauWauOracle: String =
    s"""WITH ${Q.eventsUs},
       |act AS (
       |  SELECT DISTINCT user_id,
       |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
       |      AS BIGINT) AS day_num
       |  FROM ev),
       |days AS (SELECT DISTINCT day_num FROM act),
       |dau AS (SELECT day_num, COUNT(*) AS dau FROM act GROUP BY 1),
       |wau AS (
       |  SELECT d.day_num, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
       |  FROM days d JOIN act a
       |    ON a.day_num BETWEEN d.day_num - 6 AND d.day_num
       |  GROUP BY 1)
       |SELECT day_num, dau, wau,
       |  CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_micro
       |FROM dau JOIN wau USING (day_num) ORDER BY day_num""".stripMargin

  /** The A/B arm CTEs shared by the report gate (q176) and the
    * significance gate (q182): first-signup assignment, converted
    * users, per-variant counts, exact floor-division micro rate.
    */
  private def abArmsOracle: String =
    s"""WITH ${Q.eventsUs},
       |f AS (
       |  SELECT user_id, ts AS s_ts,
       |    CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) % 2
       |      AS variant
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |          ORDER BY ts, event_id) AS rn
       |        FROM ev WHERE event_type = 'signup')
       |  WHERE rn = 1),
       |c AS (
       |  SELECT DISTINCT p.user_id
       |  FROM ev p JOIN f ON p.user_id = f.user_id
       |  WHERE p.event_type = 'purchase' AND p.ts > f.s_ts),
       |g AS (
       |  SELECT f.variant, COUNT(*) AS n_users,
       |    CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_converted
       |  FROM f LEFT JOIN c ON f.user_id = c.user_id
       |  GROUP BY 1),
       |r AS (
       |  SELECT variant, n_users, n_converted,
       |    CAST(n_converted * 1000000 // n_users AS BIGINT) AS conv_micro
       |  FROM g)""".stripMargin

  /** q171's valid sets + MIN per user per step; latency = µs from the
    * first view to the earliest valid step-k event (epoch_us diffs are
    * exact BIGINT in both engines). Shared by the operator gate (q175)
    * and the SQL-text twin (q187).
    */
  private def funnelLatencyOracle: String =
    s"""WITH ${Q.eventsUs},
       |v AS (SELECT user_id, ts FROM ev WHERE event_type = 'view'),
       |c0 AS (SELECT user_id, ts FROM ev WHERE event_type = 'click'),
       |p0 AS (SELECT user_id, ts FROM ev WHERE event_type = 'purchase'),
       |vc AS (
       |  SELECT DISTINCT c0.user_id, c0.ts
       |  FROM c0 JOIN v ON v.user_id = c0.user_id
       |    AND v.ts < c0.ts AND c0.ts <= v.ts + INTERVAL 3 DAY),
       |vp AS (
       |  SELECT DISTINCT p0.user_id, p0.ts
       |  FROM p0 JOIN vc ON vc.user_id = p0.user_id
       |    AND vc.ts < p0.ts AND p0.ts <= vc.ts + INTERVAL 3 DAY),
       |t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM v GROUP BY 1),
       |t2 AS (SELECT user_id, MIN(ts) AS ts2 FROM vc GROUP BY 1),
       |t3 AS (SELECT user_id, MIN(ts) AS ts3 FROM vp GROUP BY 1)
       |SELECT CAST(2 AS BIGINT) AS step, COUNT(*) AS n_users,
       |  CAST(SUM(epoch_us(ts2) - epoch_us(ts1)) AS BIGINT)
       |    AS sum_latency_us,
       |  CAST(MAX(epoch_us(ts2) - epoch_us(ts1)) AS BIGINT)
       |    AS max_latency_us
       |FROM t2 JOIN t1 USING (user_id)
       |UNION ALL
       |SELECT 3, COUNT(*),
       |  CAST(SUM(epoch_us(ts3) - epoch_us(ts1)) AS BIGINT),
       |  CAST(MAX(epoch_us(ts3) - epoch_us(ts1)) AS BIGINT)
       |FROM t3 JOIN t1 USING (user_id)
       |ORDER BY step""".stripMargin

  /** Valid-set reachability replayed as EXISTS chains: a click is
    * funnel-valid iff some view precedes it within the window; a
    * purchase converts iff some VALID click precedes it within the
    * window. Timestamps compare at full µs; the window is an exact
    * INTERVAL addition in both engines. Shared by the operator gate
    * (q171) and the SQL-text twin (q181).
    */
  private def windowedFunnelOracle: String =
    s"""WITH ${Q.eventsUs},
       |v AS (SELECT user_id, ts FROM ev WHERE event_type = 'view'),
       |c0 AS (SELECT user_id, ts FROM ev WHERE event_type = 'click'),
       |p0 AS (SELECT user_id, ts FROM ev WHERE event_type = 'purchase'),
       |vc AS (
       |  SELECT DISTINCT c0.user_id, c0.ts
       |  FROM c0 JOIN v ON v.user_id = c0.user_id
       |    AND v.ts < c0.ts AND c0.ts <= v.ts + INTERVAL 3 DAY),
       |vp AS (
       |  SELECT DISTINCT p0.user_id
       |  FROM p0 JOIN vc ON vc.user_id = p0.user_id
       |    AND vc.ts < p0.ts AND p0.ts <= vc.ts + INTERVAL 3 DAY)
       |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM v
       |UNION ALL
       |SELECT 2, 'click', COUNT(DISTINCT user_id) FROM vc
       |UNION ALL
       |SELECT 3, 'purchase', COUNT(*) FROM vp
       |ORDER BY step""".stripMargin

  /** Shared by the DataFrame gate (q166/q167) and the SQL-text twins
    * (q173/q174): identical semantics must gate against identical SQL.
    */
  private def retentionOracle: String =
    s"""WITH ${Q.eventsUs},
       |act AS (
       |  SELECT DISTINCT user_id,
       |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
       |      AS BIGINT) AS day
       |  FROM ev),
       |cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
       |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
       |  COUNT(*) AS n_users
       |FROM act a JOIN cohort c ON a.user_id = c.user_id
       |WHERE a.day - c.cohort_day <= 7
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def attributionOracle: String =
    s"""WITH ${Q.eventsUs},
       |p AS (SELECT event_id, user_id, ts FROM ev
       |      WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, ts FROM ev WHERE event_type = 'click'),
       |la AS (
       |  SELECT p.event_id, p.ts AS pts, MAX(c.ts) AS cts
       |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
       |  GROUP BY 1, 2)
       |SELECT
       |  CAST(datediff('day', DATE '1970-01-01', CAST(pts AS DATE))
       |    AS BIGINT) AS day_num,
       |  COUNT(*) AS n_purchases,
       |  CAST(SUM(CASE WHEN cts IS NOT NULL
       |    AND date_diff('second', cts, pts) <= 259200 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_attributed
       |FROM la GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact distinct-user cube over ALL events — the oracle for BOTH the
    * one-shot HLL cube (q179) and the merged-batch cube (q180): at gate
    * cardinalities the sketches are coupon-exact, so the two must
    * reproduce the exact cube cell for cell.
    */
  private def distinctCubeOracle: String =
    s"""WITH ${Q.eventsUs},
       |d AS (
       |  SELECT event_type,
       |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
       |      AS BIGINT) AS day_num,
       |    user_id
       |  FROM ev)
       |SELECT event_type, day_num,
       |  CAST(GROUPING(event_type, day_num) AS BIGINT) AS gid,
       |  COUNT(*) AS n_rows,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_est
       |FROM d GROUP BY ROLLUP(event_type, day_num)
       |ORDER BY gid, event_type, day_num""".stripMargin

  override def oracles: Map[String, String] = Map(

    "q179_distinct_cube_hll" -> distinctCubeOracle,

    "q180_cube_merge" -> distinctCubeOracle,

    "q157_token_cube" ->
      """SELECT source, lang,
        |  CAST(GROUPING(source, lang) AS BIGINT) AS gid,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM documents
        |GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source, lang""".stripMargin,

    "q158_lang_pivot" ->
      """SELECT source,
        |  COUNT(*) FILTER (lang = 'de') AS de,
        |  COUNT(*) FILTER (lang = 'en') AS en,
        |  COUNT(*) FILTER (lang = 'es') AS es,
        |  COUNT(*) FILTER (lang = 'fr') AS fr,
        |  COUNT(*) FILTER (lang = 'zh') AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q159_metrics_unpivot" ->
      """WITH agg AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS n_en
        |  FROM documents GROUP BY source)
        |SELECT source, 'n_docs' AS metric, n_docs AS value FROM agg
        |UNION ALL
        |SELECT source, 'n_chars', n_chars FROM agg
        |UNION ALL
        |SELECT source, 'n_en', n_en FROM agg
        |ORDER BY source, metric""".stripMargin,

    "q160_winsorized_len" ->
      """WITH r AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents),
        |t AS (
        |  SELECT source,
        |    MIN(CASE WHEN rn = 5 * (n - 1) // 100 + 1 THEN v END) AS lo,
        |    MAX(CASE WHEN rn = 95 * (n - 1) // 100 + 1 THEN v END) AS hi
        |  FROM r
        |  WHERE rn = 5 * (n - 1) // 100 + 1 OR rn = 95 * (n - 1) // 100 + 1
        |  GROUP BY source),
        |c AS (
        |  SELECT r.source, r.v,
        |    GREATEST(LEAST(r.v, t.hi), t.lo) AS w
        |  FROM r JOIN t USING (source))
        |SELECT c.source, COUNT(*) AS n,
        |  MIN(t.lo) AS lo, MIN(t.hi) AS hi,
        |  CAST(SUM(v) AS BIGINT) AS sum_raw,
        |  CAST(SUM(w) AS BIGINT) AS sum_winsorized,
        |  CAST(SUM(CASE WHEN w <> v THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
        |FROM c JOIN t USING (source)
        |GROUP BY c.source ORDER BY c.source""".stripMargin,

    "q161_moving_window" ->
      s"""WITH ${Q.eventsUs},
         |d AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day_num,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
         |      AS day_total
         |  FROM ev GROUP BY 1, 2)
         |SELECT event_type, day_num,
         |  CAST(day_total AS DOUBLE) AS day_total,
         |  CAST(SUM(day_total) OVER (PARTITION BY event_type ORDER BY day_num
         |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS win_total,
         |  CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day_num
         |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS win_days
         |FROM d ORDER BY event_type, day_num""".stripMargin,

    "q165_funnel" ->
      s"""WITH ${Q.eventsUs},
         |t1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e
         |       JOIN t1 ON e.user_id = t1.user_id
         |       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
         |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e
         |       JOIN t2 ON e.user_id = t2.user_id
         |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
         |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
         |  COUNT(*) AS n_users FROM t1
         |UNION ALL
         |SELECT 2, 'click', COUNT(*) FROM t2
         |UNION ALL
         |SELECT 3, 'purchase', COUNT(*) FROM t3
         |ORDER BY step""".stripMargin,

    "q166_retention" -> retentionOracle,

    "q167_attribution" -> attributionOracle,

    // The SQL-text twins gate against the SAME oracles as their
    // DataFrame/asOfJoin counterparts — one semantics, two entry points
    // (the q112/q113/q168 discipline).
    "q173_retention_sql" -> retentionOracle,

    "q174_attribution_sql" -> attributionOracle,

    "q168_cube_sql" ->
      """SELECT source, lang,
        |  CAST(GROUPING(source, lang) AS BIGINT) AS gid,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS n_tokens
        |FROM documents
        |GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source, lang""".stripMargin,

    // Replays the sketch arithmetic itself (the q141/q169 discipline):
    // width-4 bucket index, ASC cumsums on the sketch rows, threshold =
    // lower bound of the bucket containing rank p·(n−1)//100 + 1, then
    // the same clamp/sum tail as q160.
    "q170_winsorized_sketch" ->
      """WITH r AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
        |h AS (
        |  SELECT source, LEAST(4095, GREATEST(0, v // 4)) AS b,
        |    COUNT(*) AS c
        |  FROM r GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, b, c,
        |    SUM(c) OVER (PARTITION BY source ORDER BY b) AS cum,
        |    SUM(c) OVER (PARTITION BY source) AS n
        |  FROM h),
        |t AS (
        |  SELECT source,
        |    MIN(CASE WHEN cum >= 5 * (n - 1) // 100 + 1 THEN b * 4 END)
        |      AS lo,
        |    MIN(CASE WHEN cum >= 95 * (n - 1) // 100 + 1 THEN b * 4 END)
        |      AS hi
        |  FROM cum GROUP BY source),
        |c AS (
        |  SELECT r.source, r.v, GREATEST(LEAST(r.v, t.hi), t.lo) AS w
        |  FROM r JOIN t USING (source))
        |SELECT c.source, COUNT(*) AS n,
        |  MIN(t.lo) AS lo, MIN(t.hi) AS hi,
        |  CAST(SUM(v) AS BIGINT) AS sum_raw,
        |  CAST(SUM(w) AS BIGINT) AS sum_winsorized,
        |  CAST(SUM(CASE WHEN w <> v THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clamped
        |FROM c JOIN t USING (source)
        |GROUP BY c.source ORDER BY c.source""".stripMargin,

    "q171_windowed_funnel" -> windowedFunnelOracle,

    // Shared by the exact tier and the coupon-exact HLL tier — the
    // q179 discipline: same user domain, so the sketches sit in exact
    // coupon mode at gate cardinalities and COUNT(DISTINCT) IS the
    // oracle for both.
    "q184_dau_wau" -> dauWauOracle,
    "q185_dau_wau_sketch" -> dauWauOracle,

    // Every qualifying (purchase, click) pair, per-purchase fan-out k,
    // exact 1e6 // k credit, grouped by the click's day — the same µs
    // lookback arithmetic as the last-touch oracle.
    "q188_linear_attribution" ->
      s"""WITH ${Q.eventsUs},
         |p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM ev
         |      WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts AS c_ts FROM ev
         |      WHERE event_type = 'click'),
         |pr AS (
         |  SELECT p.p_id, c.c_ts
         |  FROM p JOIN c ON c.user_id = p.user_id
         |    AND c.c_ts <= p.p_ts
         |    AND epoch_us(p.p_ts) - epoch_us(c.c_ts) <= 259200000000),
         |k AS (SELECT p_id, COUNT(*) AS k FROM pr GROUP BY 1),
         |cr AS (
         |  SELECT pr.c_ts, pr.p_id, CAST(1000000 // k.k AS BIGINT)
         |    AS credit_micro
         |  FROM pr JOIN k USING (p_id))
         |SELECT
         |  CAST(datediff('day', DATE '1970-01-01', CAST(c_ts AS DATE))
         |    AS BIGINT) AS day_num,
         |  COUNT(*) AS n_clicks_credited,
         |  CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases_touched,
         |  CAST(SUM(credit_micro) AS BIGINT) AS sum_credit_micro
         |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact integer weights 2^(3-d) and floor-division credits — `//`
    // is DuckDB's integral divide, `div` Spark's; identical BIGINTs
    "q195_decay_attribution" ->
      s"""WITH ${Q.eventsUs},
         |p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM ev
         |      WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts AS c_ts FROM ev
         |      WHERE event_type = 'click'),
         |pr AS (
         |  SELECT p.p_id, c.c_ts,
         |    (1 << CAST(3 - (epoch_us(p.p_ts) - epoch_us(c.c_ts))
         |       // 86400000000 AS INTEGER)) AS w
         |  FROM p JOIN c ON c.user_id = p.user_id
         |    AND c.c_ts <= p.p_ts
         |    AND epoch_us(p.p_ts) - epoch_us(c.c_ts) <= 259200000000),
         |k AS (SELECT p_id, SUM(w) AS wsum FROM pr GROUP BY 1),
         |cr AS (
         |  SELECT pr.c_ts, pr.p_id,
         |    CAST((pr.w * 1000000) // k.wsum AS BIGINT) AS credit_micro
         |  FROM pr JOIN k USING (p_id))
         |SELECT
         |  CAST(datediff('day', DATE '1970-01-01', CAST(c_ts AS DATE))
         |    AS BIGINT) AS day_num,
         |  COUNT(*) AS n_clicks_credited,
         |  CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases_touched,
         |  CAST(SUM(credit_micro) AS BIGINT) AS sum_credit_micro
         |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    // HUGEINT replays the DECIMAL(38,0) skew product; (n DESC, key)
    // tiebreak makes the top-5 deterministic in both engines.
    "q189_skew_report" ->
      """WITH c AS (
        |  SELECT CAST(lang AS VARCHAR) AS key, COUNT(*) AS n
        |  FROM documents GROUP BY 1),
        |t AS (SELECT SUM(n) AS total, COUNT(*) AS nkeys FROM c),
        |top AS (
        |  SELECT key, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank
        |  FROM c)
        |SELECT CAST(rank AS INTEGER) AS rank, key, n,
        |  CAST(n * 1000000 // total AS BIGINT) AS share_micro,
        |  CAST(CAST(n AS HUGEINT) * nkeys * 1000000 // total AS BIGINT)
        |    AS skew_micro
        |FROM top, t WHERE rank <= 5 ORDER BY rank""".stripMargin,

    // LAG in the same (us, event_id) order as the Spark window; the
    // probability is the exact BIGINT floor division both engines share.
    "q186_transition_matrix" ->
      s"""WITH ${Q.eventsUs},
         |g AS (
         |  SELECT user_id, event_type,
         |    LAG(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev
         |  FROM ev),
         |c AS (
         |  SELECT prev, event_type AS next, COUNT(*) AS n
         |  FROM g WHERE prev IS NOT NULL GROUP BY 1, 2)
         |SELECT prev, next, n,
         |  CAST(SUM(n) OVER (PARTITION BY prev) AS BIGINT) AS n_from,
         |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev)
         |    AS BIGINT) AS p_micro
         |FROM c ORDER BY prev, next""".stripMargin,

    // Same oracle as q171 — one semantics, two entry points (the
    // retention/attribution twin discipline above).
    "q181_funnel_sql" -> windowedFunnelOracle,

    // First signup via the same (ts, event_id) order as min(struct) —
    // event_id is unique, so the struct's props tail never decides.
    "q176_ab_report" ->
      s"""$abArmsOracle
         |SELECT variant, n_users, n_converted, conv_micro
         |FROM r ORDER BY variant""".stripMargin,

    // HUGEINT replays the DECIMAL(38,0) integer z² inequality exactly;
    // same arm CTEs as q176 — one semantics, one more derived verdict.
    "q182_ab_significance" ->
      s"""$abArmsOracle,
         |p AS (
         |  SELECT
         |    COALESCE(MAX(CASE WHEN variant = 0 THEN n_users END), 0) AS n0,
         |    COALESCE(MAX(CASE WHEN variant = 0 THEN n_converted END), 0) AS c0,
         |    COALESCE(MAX(CASE WHEN variant = 0 THEN conv_micro END), 0) AS r0,
         |    COALESCE(MAX(CASE WHEN variant = 1 THEN n_users END), 0) AS n1,
         |    COALESCE(MAX(CASE WHEN variant = 1 THEN n_converted END), 0) AS c1,
         |    COALESCE(MAX(CASE WHEN variant = 1 THEN conv_micro END), 0) AS r1
         |  FROM r)
         |SELECT n0, c0, n1, c1,
         |  CAST(r0 - r1 AS BIGINT) AS rate_diff_micro,
         |  CASE WHEN n0 > 0 AND n1 > 0 AND c0 + c1 > 0 AND c0 + c1 < n0 + n1
         |    THEN 625 * CAST(c0 * n1 - c1 * n0 AS HUGEINT)
         |           * CAST(c0 * n1 - c1 * n0 AS HUGEINT) * (n0 + n1)
         |      > 2401 * CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
         |           * (n0 + n1 - c0 - c1)
         |  END AS significant
         |FROM p""".stripMargin,

    // The integer z-test replayed verbatim: trailing-week sums off the
    // same RANGE frame, the squared inequality in BIGINTs.
    "q177_daily_anomaly" ->
      s"""WITH ${Q.eventsUs},
         |d AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day_num,
         |    COUNT(*) AS n
         |  FROM ev GROUP BY 1, 2)
         |SELECT event_type, day_num, n,
         |  COUNT(*) OVER w AS d7,
         |  CAST(SUM(n) OVER w AS BIGINT) AS s7,
         |  CAST(SUM(n * n) OVER w AS BIGINT) AS q7,
         |  CASE WHEN COUNT(*) OVER w = 7 THEN
         |    (7 * n - SUM(n) OVER w) * (7 * n - SUM(n) OVER w)
         |      > 4 * (7 * SUM(n * n) OVER w - SUM(n) OVER w * SUM(n) OVER w)
         |  END AS is_anomaly
         |FROM d
         |WINDOW w AS (PARTITION BY event_type ORDER BY day_num
         |  RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
         |ORDER BY event_type, day_num""".stripMargin,

    // LAG gap flags + running session ids + the two rollups, all in the
    // same (us, event_id) order; µs arithmetic exact in both engines.
    "q178_session_stats" ->
      s"""WITH ${Q.eventsUs},
         |e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM ev),
         |g AS (
         |  SELECT user_id, event_id, us,
         |    CASE WHEN LAG(us) OVER w IS NULL
         |           OR us - LAG(us) OVER w > 1800000000 THEN 1
         |         ELSE 0 END AS new_s
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT user_id, us,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM g),
         |per AS (
         |  SELECT user_id, sid, COUNT(*) AS n_events,
         |    MAX(us) - MIN(us) AS dur_us
         |  FROM s GROUP BY 1, 2)
         |SELECT n_events, COUNT(*) AS n_sessions,
         |  CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "q175_funnel_latency" -> funnelLatencyOracle,

    // Same oracle as q175 — the q171/q181 twin discipline applied to
    // the latency report.
    "q187_funnel_latency_sql" -> funnelLatencyOracle,

    "q172_distinct_cube" ->
      s"""WITH ${Q.eventsUs},
         |d AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day_num,
         |    user_id
         |  FROM ev)
         |SELECT event_type, day_num,
         |  CAST(GROUPING(event_type, day_num) AS BIGINT) AS gid,
         |  COUNT(*) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM d GROUP BY ROLLUP(event_type, day_num)
         |ORDER BY gid, event_type, day_num""".stripMargin,

    "q162_corr_moments" ->
      """WITH b AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS y
        |  FROM documents)
        |SELECT source, COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(SUM(x * y) AS BIGINT) AS sxy,
        |  CAST(SUM(x * x) AS BIGINT) AS sxx,
        |  CAST(SUM(y * y) AS BIGINT) AS syy
        |FROM b GROUP BY source ORDER BY source""".stripMargin
  )
}
