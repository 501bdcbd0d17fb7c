package graft.queries

import graft.Tables
import graft.operators.{Dedup, Similarity}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second coverage batch:
  *  - grouping analytics (rollup/cube — free in batch Spark, absent from
  *    the reference but part of a complete SQL surface)
  *  - correlated subqueries / scalar aggregates
  *  - date/string scalar function surface (SURVEY §2.8)
  *  - rows-only queries (no SQL-expressible oracle) for the operators the
  *    driver checks by shape: simhash near-dups, language ID, hyperplane
  *    LSH ANN, bloom distinct.
  */
/** SQL statements shared verbatim between spark.sql and the DuckDB
  * oracle (dialect-neutral ANSI).
  */
object SqlText {
  val q35: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  val q36: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer) t
      |WHERE rk <= 5""".stripMargin

  /** GROUPING SETS — the explicit form completing the rollup/cube family
    * (dialect-neutral: identical text runs on Spark and DuckDB).
    */
  val q62: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
}

object ExtendedQueries extends QueryModule {
  import Q._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROLLUP hierarchy totals (region > nation), null-filled subtotals.
    "q28_rollup" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("acctbal"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    }),

    // CUBE over two independent dims.
    "q29_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
    }),

    // Correlated scalar subquery: orders above their customer's average.
    "q30_correlated" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val avgPer = o.groupBy($"o_custkey".as("k"))
        .agg((sum(dec2($"o_totalprice")).cast("double") / count(lit(1))).as("avg_price"))
      o.join(avgPer, o("o_custkey") === avgPer("k"))
        .filter($"o_totalprice" > $"avg_price" * 1.5)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_above"))
        .orderBy($"o_orderstatus")
    }),

    // Date arithmetic surface: month truncation, extraction, datediff.
    "q31_date_functions" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .withColumn("month", date_trunc("month", $"o_orderdate").cast("date"))
        .withColumn("yr", year($"o_orderdate"))
        .withColumn("qtr", quarter($"o_orderdate"))
        .groupBy($"yr", $"qtr", $"month")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
        .orderBy($"month")
    }),

    // String function surface: upper/substr/concat/like-filter
    // (reference MapDemo.java:26 toUpperCase etc.).
    "q32_string_functions" -> ((s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .filter($"p_type".contains("ECO") || $"p_name".startsWith("small"))
        .select($"p_partkey",
          upper($"p_brand").as("brand_u"),
          substring($"p_name", 1, 8).as("name_prefix"),
          concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
          length($"p_name").as("name_len"))
    }),

    // Multi-column composite-key aggregation (reference
    // KeyedMultipleDemo.java:33-56) + HAVING.
    "q33_composite_key_having" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus", $"l_suppkey")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
        .filter($"n" >= 100)
        .orderBy($"l_returnflag", $"l_linestatus", $"l_suppkey")
    }),

    // Global aggregate without keys (windowAll analog —
    // reference CountWindowAllApplyDemo etc.: keyless global aggregation).
    "q34_global_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          dsum($"l_extendedprice").as("total_price"),
          min($"l_shipdate").cast("date").as("min_ship"),
          max($"l_shipdate").cast("date").as("max_ship"),
          countDistinct($"l_orderkey").as("n_orders"))
    }),

    // Text-SQL entry point (reference SQL surface, day10/_09-_11): the
    // exact same statement runs via spark.sql over registered views AND
    // as the DuckDB oracle.
    // Exact interpolated percentiles (rounded for cross-engine compare).
    "q37_percentiles" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("pq"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"))
        .select($"l_returnflag",
          round(element_at($"pq", 1), 4).as("p25"),
          round(element_at($"pq", 2), 4).as("p50"),
          round(element_at($"pq", 3), 4).as("p75"),
          $"median_qty")
        .orderBy($"l_returnflag")
    }),

    // Bounded-memory percentile sketch vs exact (completes the sketch
    // family: HLL q56, bloom q43, quantile here) — the q43 gate pattern:
    // the oracle supplies exact + TRUE, the estimate must land within 1%.
    "q67_approx_percentile" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_p50"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap"))
        .select($"l_returnflag", $"exact_p50",
          (abs($"ap" - $"exact_p50") <= abs($"exact_p50") * 0.01).as("approx_ok"))
        .orderBy($"l_returnflag")
    }),

    // Array aggregation + array functions.
    "q38_array_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(sort_array(collect_set($"l_linestatus")).as("st"))
        .select($"l_returnflag",
          concat_ws(",", $"st").as("statuses"),
          size($"st").as("n_statuses"),
          array_contains($"st", "O").as("has_o"))
        .orderBy($"l_returnflag")
    }),

    // NULL semantics: nullif/coalesce/conditionals.
    "q39_null_handling" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .withColumn("prio", nullif($"o_orderpriority", lit("5-LOW")))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          count($"prio").as("n_not_low"),
          count(when($"prio".isNull, 1)).as("n_low"),
          min(coalesce($"prio", lit("ZZZ"))).as("min_prio"))
        .orderBy($"o_orderstatus")
    }),

    "q35_sql_text" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql(SqlText.q35)
    }),

    // GROUPING SETS through the shared-SQL path.
    "q62_grouping_sets" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql(SqlText.q62)
    }),

    // SQL window functions via text (rank over partition).
    "q36_sql_window" -> ((s, dir) => {
      graft.sql.SqlSurface.registerTables(s, dir)
      s.sql(SqlText.q36)
    }),

    // As-of join through the library operator (custom-operator ladder
    // tier (a)): for each purchase, the user's latest signup at-or-before
    // it. Relational.asOfJoin unions the sides and propagates the right
    // payload with last() over a per-key time window — one shuffle on
    // user_id, no range-probe pair explosion.
    "q47_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts")
      val signups = ev.filter($"event_type" === "signup")
        .select($"user_id", $"ts", $"event_id")
      graft.operators.Relational.asOfJoin(purchases, signups,
          Seq("user_id"), "ts", "ts", tieBreak = Seq("event_id"))
        .filter($"asof".isNotNull)
        .select($"user_id", $"event_id".as("purchase_id"),
          epochS($"ts").as("purchase_sec"),
          epochS($"asof.ts").as("asof_signup_sec"))
    }),

    // Exact dedup keeping the smallest id per identical payload
    // (operators.Dedup.exactDedup through the gate).
    "q48_dedup_keep_first" -> ((s, dir) => {
      Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_id", "source")
    }),

    // Language-ID heuristic distribution.
    "q41_lang_id" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("lid", TextFunctions.langId($"text"))
        .groupBy($"lid").agg(count(lit(1)).as("n"))
    }),

    // Bloom-filter distinct per event type vs exact (bounded-memory
    // distinct at scale). The raw estimate is engine-specific, so the
    // gate-checkable form asserts the estimate lands within 5% of exact —
    // the oracle supplies exact + TRUE.
    "q43_bloom_distinct" -> ((s, dir) => {
      import s.implicits._
      val bloom = udaf(new graft.functions.BloomDistinct(1 << 18))
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(bloom($"user_id").as("approx_users"),
          countDistinct($"user_id").as("exact_users"))
        .select($"event_type", $"exact_users",
          (abs($"approx_users" - $"exact_users") <=
            $"exact_users".cast("double") * 0.05).as("bloom_ok"))
    }),

    // Multimodal binary-column metadata (documents.text cast to binary
    // payloads): byte size + content digest dedup profile per source —
    // the REAL (non-stub) part of graft.multimodal.
    "q45_binary_meta" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("payload", $"text".cast("binary"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n"),
          sum(length($"payload")).as("total_bytes"),
          countDistinct(md5($"payload")).as("n_distinct_payloads"))
        .orderBy($"source")
    }),

    // Multimodal decode/resize/embed pipeline (stub decode, real
    // plumbing), md5-twin stubs so every stage — metadata, decoded dims,
    // resize arithmetic, embedding — is oracle-verified end to end. The
    // embedding is summarized as an exact integer (sum of milli-units):
    // no float-accumulation-order hazard in the gate compare.
    "q46_multimodal_pipeline" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val withBin = Tables.documents(s, dir)
        .withColumn("payload", $"text".cast("binary"))
      Multimodal.withBinaryMetaMd5(withBin, "payload")
        .withColumn("img", Multimodal.decodeStubMd5($"payload"))
        .withColumn("small", Multimodal.resizeStub($"img", 256))
        .withColumn("emb", Multimodal.embedStubMd5($"payload", 16))
        .select($"doc_id", $"byte_size", $"format", $"content_hash",
          $"img.width", $"img.height",
          $"small.width".as("rw"), $"small.height".as("rh"),
          aggregate($"emb", lit(0L),
            (acc, x) => acc + round(x * 1000).cast("long")).as("emb_milli"))
    }),

    // Custom physical operator: heap-based top-k per group
    // (O(n log k), no per-group sort — 2.7x the row_number plan at
    // sf0.1). Output is (group, value) only: the top-3 ov MULTISET per
    // group is deterministic even when tied rows differ in identity, so
    // this hash-matches a row_number oracle.
    "q49_native_topk" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .withColumn("ov", $"l_extendedprice" * 100 + $"l_linenumber")
      graft.plans.TopK.topKPerGroup(li, Seq("l_suppkey"), "ov", 3)
        .select($"l_suppkey", $"ov")
    }),

    // Video frame-sampling plumbing through the gate (duration stand-in:
    // n_chars seconds, one frame per 50s): the explode shape, frame ids,
    // and per-source frame budget are all oracle-checked; only the frame
    // DECODE stays stubbed (no codecs in this environment).
    "q71_frame_sampling" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val withBin = Tables.documents(s, dir)
        .withColumn("payload", $"text".cast("binary"))
      val meta = Multimodal.withBinaryMetaMd5(withBin, "payload")
        .withColumn("dur", $"n_chars".cast("double"))
      Multimodal.sampleFrames(meta, "dur", everyNSec = 50.0)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(concat($"content_hash", lit("#"),
            $"frame_idx".cast("string"))).as("n_distinct_frames"),
          max($"frame_idx").as("max_idx"))
        .orderBy($"source")
    }),

    // Partition-batched decode plumbing (the mapInPandas shape in Scala:
    // per-partition codec lifecycle + bounded batches). The Md5Codec twin
    // makes the decoded dimensions oracle-reproducible, so the whole
    // mapPartitions pipeline — batching, lifecycle, schema — is
    // gate-verified; MultimodalSpec additionally asserts the lifecycle.
    "q59_decode_partitioned" -> ((s, dir) => {
      val df = Tables.documents(s, dir)
        .withColumn("payload", col("text").cast("binary"))
      graft.multimodal.Multimodal.decodePartitioned(df, "doc_id", "payload",
        () => new graft.multimodal.Multimodal.Md5Codec)
    }),

    // REAL image decode through the partition-batched codec plumbing: the
    // payloads are genuine PNG/JPEG/GIF files (encoded by javax.imageio)
    // whose dimensions/colorspace derive arithmetically from doc_id, and
    // HeaderCodec parses the actual IHDR / SOF / screen-descriptor bytes
    // back out — so the oracle verifies a real parse, not an md5 law.
    // 1-in-5 doc sample: encode cost stays bench-proportionate.
    "q109_image_decode" -> ((s, dir) => {
      import s.implicits._
      // repartition the tiny id list before the CPU-bound encode map —
      // the fixture is one parquet split, which would otherwise put
      // every encode in a single task
      val ids = Tables.documents(s, dir)
        .filter($"doc_id" % 5 === 0).select($"doc_id").as[Long]
        .repartition(32)
      val payloads = ids.map { id =>
        val w = (id % 97 + 8).toInt
        val h = (id % 53 + 8).toInt
        val gray = (id / 3) % 2 == 1
        val bytes = (id % 3) match {
          case 0 => graft.multimodal.SyntheticImages.png(w, h, gray)
          case 1 => graft.multimodal.SyntheticImages.jpeg(w, h, gray)
          case _ => graft.multimodal.SyntheticImages.gif(w, h)
        }
        (id, bytes)
      }.toDF("doc_id", "payload")
      graft.multimodal.Multimodal.decodePartitioned(payloads, "doc_id",
        "payload", () => new graft.multimodal.HeaderCodec)
    }),

    // REAL image resize end to end: the q109 fixtures (genuine encoded
    // PNG/JPEG/GIF) are downscaled to maxSide=32 through the
    // partition-batched resize (decode -> bilinear RGB -> re-encode
    // PNG), and the output dims are parsed back OUT OF THE RESIZED
    // BYTES — the oracle recomputes the target size with the same
    // integer arithmetic (w*32 div max(w,h), min 1), so a hash match
    // proves a real pixel pipeline resized to spec. Map-only: the one
    // exchange is the fixture repartition before the CPU-bound encode.
    "q110_image_resize" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .filter($"doc_id" % 5 === 0).select($"doc_id").as[Long]
        .repartition(32)
      val payloads = ids.map { id =>
        val w = (id % 97 + 8).toInt
        val h = (id % 53 + 8).toInt
        val gray = (id / 3) % 2 == 1
        val bytes = (id % 3) match {
          case 0 => graft.multimodal.SyntheticImages.png(w, h, gray)
          case 1 => graft.multimodal.SyntheticImages.jpeg(w, h, gray)
          case _ => graft.multimodal.SyntheticImages.gif(w, h)
        }
        (id, bytes)
      }.toDF("doc_id", "payload")
      graft.multimodal.Multimodal
        .resizePartitioned(payloads, "doc_id", "payload", maxSide = 32)
        .select(col("doc_id"), col("width"), col("height"))
    }),

    // REAL audio metadata end to end: genuine PCM WAV fixtures (RIFF +
    // fmt + word-aligned data chunk, real 16-bit samples) whose
    // parameters derive from doc_id arithmetic; AudioHeader walks the
    // actual chunk bytes back out. The oracle recomputes the planted
    // params + integer-law duration, so a hash match proves a real
    // RIFF parse. 1-in-7 doc sample keeps synth cost bench-proportionate.
    "q111_audio_meta" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .filter($"doc_id" % 7 === 0).select($"doc_id").as[Long]
        .repartition(32)
      val payloads = ids.map { id =>
        val rate = Seq(8000, 16000, 22050, 44100)((id % 4).toInt)
        val ch = (id % 2 + 1).toInt
        val frames = (id % 997 + 100).toInt
        (id, graft.multimodal.SyntheticAudio.wav(rate, ch, frames))
      }.toDF("doc_id", "payload")
      graft.multimodal.Multimodal
        .audioMetaPartitioned(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_ms"))
    }),

    // REAL video metadata end to end: genuine AVI fixtures (RIFF
    // container, hdrl LIST, 56-byte avih main header, vids stream list,
    // movi frames) whose parameters derive from doc_id arithmetic;
    // VideoHeader walks the actual chunk bytes back out. The oracle
    // recomputes the planted params + integer-law duration, so a hash
    // match proves a real RIFF/AVI parse. 1-in-5 doc sample (offset 3,
    // disjoint sampling knob from the audio gate's %7).
    "q114_video_meta" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir)
        .filter($"doc_id" % 5 === 3).select($"doc_id").as[Long]
        .repartition(32)
      val payloads = ids.map { id =>
        val w = ((id % 8).toInt + 1) * 16
        val h = ((id % 6).toInt + 1) * 16
        val usPerFrame = Seq(16667L, 33333L, 40000L)((id % 3).toInt)
        val frames = id % 509 + 24
        (id, graft.multimodal.SyntheticVideo.avi(w, h, usPerFrame, frames))
      }.toDF("doc_id", "payload")
      graft.multimodal.Multimodal
        .videoMetaPartitioned(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("width"), col("height"),
          col("us_per_frame"), col("n_frames"), col("duration_ms"))
    }),

    // FastSS deletion-neighborhood edit-distance join: EXACT dist<=1
    // pairs with no blocking assumption (len+1 hash-uniform keys per
    // string, one shuffle) — oracle is brute-force levenshtein, so the
    // gate proves completeness, not just precision.
    "q104_edit_distance_pairs" -> ((s, dir) =>
      graft.operators.Dedup.editDistance1Pairs(
        Tables.customer(s, dir), "c_custkey", "c_name")),

    // PassJoin segment-pigeonhole edit-distance join: EXACT dist<=2
    // pairs with NO blocking column and no pair enumeration (candidates
    // via equi-join on shifted segment substrings, linear keys/row);
    // oracle is brute-force all-pairs levenshtein -> proves completeness.
    // Input: 24-char document prefixes (title/fingerprint dedup shape —
    // diverse content keeps segments selective; constant-prefix ID-like
    // strings are the FastSS operator's territory, q104).
    "q105_edjoin_dist2" -> ((s, dir) =>
      graft.operators.Dedup.edJoinPairs(
        Tables.documents(s, dir)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("prefix24")),
        "doc_id", "prefix24", maxDist = 2)),

    // Morton/Z-order value over two bucketed dims — the layout key that
    // makes parquet min/max stats prune BOTH dimensions after a rewrite
    // (io.Layout.writeZOrdered; clustering effect spec'd in LayoutSpec).
    // Pure integer bit arithmetic -> exact oracle parity.
    "q108_zorder" -> ((s, dir) => {
      import s.implicits._
      val z = graft.io.Layout.zorderValue(
        Seq(pmod($"l_partkey", lit(256)), pmod($"l_suppkey", lit(256))), bits = 8)
      Tables.lineitem(s, dir)
        .withColumn("z", z)
        .groupBy($"z").agg(count(lit(1)).as("n"))
        .orderBy($"z").limit(50)
    }),

    // Skew-salted equi-join: hot fact keys split across `salts` sub-keys,
    // dim side replicated — the oracle's PLAIN join proves salting
    // redistributes work without changing the result (the q54 invariance
    // argument, join-shaped).
    "q107_salted_join" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).select($"l_suppkey", $"l_quantity")
      val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
        .withColumnRenamed("s_suppkey", "l_suppkey")
      graft.operators.Relational.saltedJoin(li, sup, Seq("l_suppkey"), salts = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
    }),

    // Window FRAMES (lag/lead/ROWS BETWEEN): the per-key sequence
    // features a feature pipeline derives from an event log. One shuffle
    // on user_id; frames evaluated in a single windowed pass.
    "q106_window_frames" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      Tables.events(s, dir).filter($"user_id" < 200)
        .select($"user_id", $"event_id", $"value")
        .withColumn("prev_v", round(lag($"value", 1).over(w), 4))
        .withColumn("next_v", round(lead($"value", 1).over(w), 4))
        .withColumn("mov3", round(sum($"value").over(w.rowsBetween(-2, 0)), 4))
        .select($"user_id", $"event_id", round($"value", 4).as("v_r"),
          $"prev_v", $"next_v", $"mov3")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q28_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${oSum("c_acctbal")} AS acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q29_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${oSum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q30_correlated" ->
      """WITH avg_per AS (
        |  SELECT o_custkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderstatus, COUNT(*) AS n_above
        |FROM orders JOIN avg_per ON o_custkey = k
        |WHERE o_totalprice > avg_price * 1.5
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q31_date_functions" ->
      s"""SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
         |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |  COUNT(*) AS n, ${oSum("o_totalprice")} AS total
         |FROM orders GROUP BY 1, 2, 3 ORDER BY month""".stripMargin,

    "q32_string_functions" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  length(p_name) AS name_len
        |FROM part
        |WHERE p_type LIKE '%ECO%' OR p_name LIKE 'small%'""".stripMargin,

    "q33_composite_key_having" ->
      s"""SELECT l_returnflag, l_linestatus, l_suppkey, COUNT(*) AS n,
         |  ${oSum("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 100
         |ORDER BY 1, 2, 3""".stripMargin,

    "q34_global_agg" ->
      s"""SELECT COUNT(*) AS n_rows, ${oSum("l_extendedprice")} AS total_price,
         |  CAST(MIN(l_shipdate) AS DATE) AS min_ship,
         |  CAST(MAX(l_shipdate) AS DATE) AS max_ship,
         |  COUNT(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem""".stripMargin,

    "q37_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q67_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q38_array_agg" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  len(list(DISTINCT l_linestatus)) AS n_statuses,
        |  list_contains(list(DISTINCT l_linestatus), 'O') AS has_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q39_null_handling" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  COUNT(nullif(o_orderpriority, '5-LOW')) AS n_not_low,
        |  COUNT(CASE WHEN nullif(o_orderpriority, '5-LOW') IS NULL THEN 1 END) AS n_low,
        |  MIN(coalesce(nullif(o_orderpriority, '5-LOW'), 'ZZZ')) AS min_prio
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // ordering mirrors Relational.asOfJoin: at equal ts the signup (right
    // side) sorts first, so a same-instant signup matches (<= semantics)
    "q47_asof_join" ->
      s"""WITH $eventsUs,
         |x AS (
         |  SELECT user_id, event_id, ts, event_type,
         |    MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) // 1000000 END)
         |      OVER (PARTITION BY user_id
         |            ORDER BY ts,
         |              CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
         |              event_id
         |            ROWS UNBOUNDED PRECEDING) AS asof_signup_sec
         |  FROM ev WHERE event_type IN ('signup', 'purchase'))
         |SELECT user_id, event_id AS purchase_id,
         |  epoch_us(ts) // 1000000 AS purchase_sec, asof_signup_sec
         |FROM x
         |WHERE event_type = 'purchase' AND asof_signup_sec IS NOT NULL""".stripMargin,

    "q48_dedup_keep_first" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1""".stripMargin,

    "q35_sql_text" -> SqlText.q35,
    "q36_sql_window" -> SqlText.q36,
    "q62_grouping_sets" -> SqlText.q62,

    "q45_binary_meta" ->
      """SELECT source, COUNT(*) AS n,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Mirrors TextFunctions.langId exactly: max stopword hits wins, ties
    // resolved to the lexicographically greatest language (Spark's
    // greatest() over struct(hits, lang)), 'und' when nothing hits.
    "q41_lang_id" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
        |h AS (SELECT
        |  len(list_filter(t, x -> x IN ('the','a','of','to','and','is','in','that','it','for'))) AS he,
        |  len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','ein','zu','ich','mit'))) AS hd,
        |  len(list_filter(t, x -> x IN ('le','la','les','et','est','un','une','de','que','pour'))) AS hf,
        |  len(list_filter(t, x -> x IN ('el','la','los','las','y','es','un','una','de','que'))) AS hs,
        |  len(list_filter(t, x -> x IN ('il','la','e','che','di','un','una','per','non','sono'))) AS hi
        |  FROM toks)
        |SELECT lid, COUNT(*) AS n FROM (
        |  SELECT CASE
        |    WHEN greatest(he, hd, hf, hs, hi) = 0 THEN 'und'
        |    WHEN hi >= he AND hi >= hd AND hi >= hf AND hi >= hs THEN 'it'
        |    WHEN hf >= he AND hf >= hd AND hf >= hs THEN 'fr'
        |    WHEN hs >= he AND hs >= hd THEN 'es'
        |    WHEN he >= hd THEN 'en'
        |    ELSE 'de' END AS lid
        |  FROM h) GROUP BY lid""".stripMargin,

    "q43_bloom_distinct" ->
      s"""WITH $eventsUs
         |SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
         |  TRUE AS bloom_ok
         |FROM ev GROUP BY event_type""".stripMargin,

    // mirrors withBinaryMetaMd5 + decodeStubMd5 + resizeStub +
    // embedStubMd5 exactly (the payload is the utf8 text, so md5(text) ==
    // md5(payload)); emb_milli is an exact integer sum of milli-units
    "q46_multimodal_pipeline" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_size,
        |    md5(text) AS content_hash,
        |    CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1920 + 32 AS INTEGER) AS width,
        |    CAST(CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1080 + 32 AS INTEGER) AS height,
        |    substr(hex(CAST(text AS BLOB)), 1, 16) AS hx8
        |  FROM documents),
        |f AS (
        |  SELECT *, CASE
        |    WHEN substr(hx8, 1, 6) = 'FFD8FF' THEN 'jpeg'
        |    WHEN substr(hx8, 1, 8) = '89504E47' THEN 'png'
        |    WHEN substr(hx8, 1, 8) = '47494638' THEN 'gif'
        |    WHEN substr(hx8, 1, 8) = '52494646' THEN 'riff'
        |    WHEN substr(hx8, 1, 6) = '494433' THEN 'mp3'
        |    WHEN substr(hx8, 1, 6) = '000000' THEN 'mp4?'
        |    ELSE 'unknown' END AS format,
        |    LEAST(1.0, 256.0 / GREATEST(width, height)) AS sc
        |  FROM b),
        |e AS (
        |  SELECT doc_id,
        |    CAST(SUM(CAST('0x' || substr(md5(hex(CAST(text AS BLOB)) || ':' ||
        |      CAST(i AS VARCHAR)), 1, 8) AS BIGINT) % 2000 - 1000) AS BIGINT) AS emb_milli
        |  FROM documents CROSS JOIN range(16) t(i)
        |  GROUP BY doc_id)
        |SELECT f.doc_id, byte_size, format, content_hash, width, height,
        |  CAST(CEIL(width * sc) AS INTEGER) AS rw,
        |  CAST(CEIL(height * sc) AS INTEGER) AS rh,
        |  emb_milli
        |FROM f JOIN e ON f.doc_id = e.doc_id""".stripMargin,

    "q71_frame_sampling" ->
      """WITH f AS (
        |  SELECT source, md5(text) AS h,
        |    unnest(range(0, (n_chars // 50) + 1)) AS i
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_frames,
        |  COUNT(DISTINCT h || '#' || CAST(i AS VARCHAR)) AS n_distinct_frames,
        |  CAST(MAX(i) AS BIGINT) AS max_idx
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    // mirrors Md5Codec: first/second 4 md5 digest bytes as unsigned ints
    "q59_decode_partitioned" ->
      """SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1920 + 32 AS INTEGER) AS width,
        |  CAST(CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1080 + 32 AS INTEGER) AS height,
        |  3 AS channels
        |FROM documents""".stripMargin,

    // The fixture dimensions are pure doc_id arithmetic (the PAYLOAD is a
    // real encoded image of that size); the oracle recomputes them, so a
    // hash match proves HeaderCodec parsed the real headers correctly.
    // Channels: gif (doc_id%3=2) is palette RGB = 3; png/jpeg alternate
    // RGB(3)/grayscale(1) on (doc_id/3)%2.
    "q109_image_decode" ->
      """SELECT doc_id,
        |  CAST(doc_id % 97 + 8 AS INTEGER) AS width,
        |  CAST(doc_id % 53 + 8 AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 3
        |            WHEN (doc_id // 3) % 2 = 1 THEN 1
        |            ELSE 3 END AS INTEGER) AS channels
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin,

    // Fixture dims are doc_id arithmetic; the resize target is the same
    // integer law the Scala side applies (floor division, min 1), so the
    // oracle verifies real decoded-and-re-encoded pixels hit the spec'd
    // geometry. maxSide=32: images with max(w,h) <= 32 pass through.
    "q110_image_resize" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 97 + 8 AS BIGINT) AS w0,
        |    CAST(doc_id % 53 + 8 AS BIGINT) AS h0
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id,
        |  CAST(CASE WHEN GREATEST(w0, h0) <= 32 THEN w0
        |       ELSE GREATEST(1, w0 * 32 // GREATEST(w0, h0)) END AS INTEGER)
        |    AS width,
        |  CAST(CASE WHEN GREATEST(w0, h0) <= 32 THEN h0
        |       ELSE GREATEST(1, h0 * 32 // GREATEST(w0, h0)) END AS INTEGER)
        |    AS height
        |FROM f""".stripMargin,

    // Fixture params are doc_id arithmetic; n_frames BIGINT (the header
    // data-length division), duration integer-floored ms.
    "q111_audio_meta" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |       WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
        |  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |  CAST(doc_id % 997 + 100 AS BIGINT) AS n_frames,
        |  CAST((doc_id % 997 + 100) * 1000 //
        |       (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |        WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,

    // Fixture params are doc_id arithmetic; duration integer-floored ms
    // from us_per_frame * n_frames.
    "q114_video_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST((doc_id % 8 + 1) * 16 AS INTEGER) AS width,
        |    CAST((doc_id % 6 + 1) * 16 AS INTEGER) AS height,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 16667 WHEN 1 THEN 33333
        |         ELSE 40000 END AS BIGINT) AS us_per_frame,
        |    CAST(doc_id % 509 + 24 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 5 = 3)
        |SELECT doc_id, width, height, us_per_frame, n_frames,
        |  us_per_frame * n_frames // 1000 AS duration_ms
        |FROM p""".stripMargin,

    "q49_native_topk" ->
      """WITH t AS (
        |  SELECT l_suppkey, l_extendedprice * 100 + l_linenumber AS ov
        |  FROM lineitem),
        |r AS (
        |  SELECT l_suppkey, ov,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY ov DESC) AS rn
        |  FROM t)
        |SELECT l_suppkey, ov FROM r WHERE rn <= 3""".stripMargin,

    // brute force — the oracle proving the deletion-neighborhood join
    // is COMPLETE (finds every true pair), not merely precise
    "q104_edit_distance_pairs" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey
        |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    "q105_edjoin_dist2" ->
      """WITH p AS (SELECT doc_id, substr(text, 1, 24) AS s FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.s, b.s) AS dist
        |FROM p a, p b
        |WHERE a.doc_id < b.doc_id
        |  AND levenshtein(a.s, b.s) <= 2""".stripMargin,

    "q107_salted_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n, ${oSum("l_quantity")} AS qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey""".stripMargin,

    // the 16 interleave terms are generated, not hand-typed — both
    // engines evaluate the identical integer expression
    "q108_zorder" -> {
      // DuckDB gives all bit operators ONE precedence level (postgres
      // rule), so every term is fully parenthesized
      val terms = (for {
        (c, j) <- Seq("(l_partkey % 256)", "(l_suppkey % 256)").zipWithIndex
        i <- 0 until 8
      } yield s"((($c >> $i) & 1) << ${i * 2 + j})").mkString(" | ")
      s"""SELECT z, COUNT(*) AS n FROM (
         |  SELECT ($terms) AS z FROM lineitem)
         |GROUP BY z ORDER BY z LIMIT 50""".stripMargin
    },

    "q106_window_frames" ->
      """SELECT user_id, event_id, ROUND(value, 4) AS v_r,
        |  ROUND(lag(value) OVER w, 4) AS prev_v,
        |  ROUND(lead(value) OVER w, 4) AS next_v,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov3
        |FROM events WHERE user_id < 200
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin
  )
}
