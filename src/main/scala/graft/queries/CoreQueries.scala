package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch relational surface: aggregation, filter/projection pushdown,
  * joins (shuffle + broadcast + semi/anti), set ops, Top-N ranking,
  * argmin/argmax, value bucketing.
  *
  * These are the Spark-first re-expressions of the reference's Table-API /
  * SQL demos (e.g. reference cn/ngt/day10/_02_StreamToTable_Agg.java:41-45
  * group-aggregate, cn/ngt/day10/_01_StreamToTable.java:39-46
  * select/where, scala/.../demo/hotitems/HotItems.scala:47-58 Top-N,
  * java/.../transformation/MinByDemo.java:44-59 min/max/minBy/maxBy,
  * scala/.../cn/bitnei/BMWMileAvgDay.scala:40-47 bucketing) mapped onto the
  * driver's TPC-H-ish tables. Scale notes per query in Scaladoc.
  */
object CoreQueries extends QueryModule {
  import Q._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing summary (TPC-H Q1 shape). Single hash-aggregate over the fact
    // table; partial aggregation map-side means the shuffle carries only
    // |groups|×|partitions| rows — scales linearly to 100 TB.
    "q01_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          dsum6(($"l_extendedprice" * (lit(1.0) - $"l_discount")) * (lit(1.0) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Filter + projection: both must reach the parquet scan
    // (PushedFilters / 4-column ReadSchema) — verified in PlanSpec.
    "q02_filter_pushdown" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_quantity" >= 49 &&
          $"l_shipdate" >= lit("2000-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("2000-04-01").cast("timestamp"))
        .select($"l_orderkey", $"l_linenumber",
          $"l_shipdate".cast("date").as("ship_date"), $"l_quantity")
    }),

    // 3-way join + aggregate. lineitem⋈orders shuffles on orderkey;
    // customer is small relative to facts and broadcast by Catalyst/AQE.
    "q03_join_agg" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment", $"o_orderstatus")
        .agg(dsum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"c_mktsegment", $"o_orderstatus")
    }),

    // Star-dimension chain with explicit broadcast hints: zero shuffles for
    // the dims, one aggregate exchange. The 100 TB plan: facts stream
    // through, dims replicated.
    "q04_broadcast_dims" -> ((s, dir) => {
      import s.implicits._
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_suppliers"), dsum($"s_acctbal").as("total_acctbal"))
    }),

    // Top-3 parts by revenue per brand (HotItems Top-N shape,
    // reference scala/.../demo/hotitems/HotItems.scala:97-136): windowed
    // rank over a pre-aggregated (brand, part) rollup — the aggregation
    // shrinks data to |parts| before the rank shuffle.
    "q05_topn_per_group" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val agg = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy($"p_brand", $"p_partkey")
        .agg(dsum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      agg.withColumn("rk", row_number().over(
          Window.partitionBy($"p_brand").orderBy($"revenue".desc, $"p_partkey")))
        .filter($"rk" <= 3)
        .select($"p_brand", $"p_partkey", $"revenue", $"rk")
    }),

    // min/max + argmin/argmax with deterministic tie-break (reference
    // java/.../transformation/MinByDemo.java:44-59 — minBy/maxBy return the
    // whole record; tie order made explicit here via struct ordering).
    "q06_argminmax" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          max($"l_extendedprice").as("max_price"),
          max_by($"l_orderkey",
            struct($"l_extendedprice", -$"l_orderkey", -$"l_linenumber")).as("max_price_orderkey"),
          min($"l_extendedprice").as("min_price"),
          min_by($"l_orderkey",
            struct($"l_extendedprice", $"l_orderkey", $"l_linenumber")).as("min_price_orderkey"))
        .orderBy($"l_returnflag")
    }),

    // count-distinct per key (reference java/.../demo/ActivityCount.java:56-98
    // running count + distinct count). Exact distinct = expand + two-phase
    // aggregate; at 100 TB prefer approx_count_distinct (HLL) — kept exact
    // here for the oracle.
    "q07_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_returnflag")
    }),

    // Semi/anti join (EXISTS / NOT EXISTS): customers with vs without
    // orders per segment. Broadcast the distinct-key side when small.
    "q08_semi_anti" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val ok = Tables.orders(s, dir).select($"o_custkey").distinct()
      val withO = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("with_orders"))
      val without = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_anti")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("without_orders"))
      withO.join(without, Seq("c_mktsegment"), "full_outer")
        .select($"c_mktsegment",
          coalesce($"with_orders", lit(0L)).as("with_orders"),
          coalesce($"without_orders", lit(0L)).as("without_orders"))
        .orderBy($"c_mktsegment")
    }),

    // Set operations (the reference only exercises union —
    // java/.../transformation/UnionDemo.java:24-27; intersect/except come
    // free in batch Spark).
    "q09_setops" -> ((s, dir) => {
      import s.implicits._
      val lp = Tables.lineitem(s, dir).select($"l_partkey".as("k")).distinct()
      val pp = Tables.part(s, dir).select($"p_partkey".as("k")).distinct()
      val inter = lp.intersect(pp).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      val exc = lp.except(pp).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
      val uni = lp.union(pp).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("union"))
      inter.union(exc).union(uni).select($"op", $"n").orderBy($"op")
    }),

    // Value bucketing → histogram (reference
    // scala/.../cn/bitnei/BMWMileAvgDay.scala:40-47 binning via if-chains;
    // here a `when` chain capped with least/floor).
    "q10_histogram" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .withColumn("bin",
          least(floor($"l_quantity" / 10.0) * 10, lit(40.0)).cast("long"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("bin_price"))
        .orderBy($"bin")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice")} AS sum_base_price,
         |  ${oSum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${oSum6("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")} AS sum_charge,
         |  ${oAvg("l_quantity")} AS avg_qty,
         |  ${oAvg("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity
        |FROM lineitem
        |WHERE l_quantity >= 49
        |  AND l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-04-01'""".stripMargin,

    "q03_join_agg" ->
      s"""SELECT c_mktsegment, o_orderstatus,
         |  ${oSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment, o_orderstatus
         |ORDER BY c_mktsegment, o_orderstatus""".stripMargin,

    "q04_broadcast_dims" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
         |  ${oSum("s_acctbal")} AS total_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,

    "q05_topn_per_group" ->
      s"""WITH agg AS (
         |  SELECT p_brand, p_partkey,
         |    ${oSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY p_brand, p_partkey)
         |SELECT p_brand, p_partkey, revenue, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rk
         |  FROM agg)
         |WHERE rk <= 3""".stripMargin,

    "q06_argminmax" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice, l_orderkey,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rmax,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber) AS rmin
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rmax = 1 THEN l_extendedprice END) AS max_price,
        |  MAX(CASE WHEN rmax = 1 THEN l_orderkey END) AS max_price_orderkey,
        |  MIN(CASE WHEN rmin = 1 THEN l_extendedprice END) AS min_price,
        |  MAX(CASE WHEN rmin = 1 THEN l_orderkey END) AS min_price_orderkey
        |FROM ranked GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q07_distinct_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q08_semi_anti" ->
      """SELECT c_mktsegment,
        |  COUNT(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS with_orders,
        |  COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS without_orders
        |FROM customer c GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q09_setops" ->
      """SELECT 'except' AS op, COUNT(*) AS n FROM
        |  (SELECT DISTINCT l_partkey FROM lineitem EXCEPT SELECT DISTINCT p_partkey FROM part)
        |UNION ALL
        |SELECT 'intersect' AS op, COUNT(*) AS n FROM
        |  (SELECT DISTINCT l_partkey FROM lineitem INTERSECT SELECT DISTINCT p_partkey FROM part)
        |UNION ALL
        |SELECT 'union' AS op, COUNT(*) AS n FROM
        |  (SELECT DISTINCT l_partkey FROM lineitem UNION SELECT DISTINCT p_partkey FROM part)
        |ORDER BY op""".stripMargin,

    "q10_histogram" ->
      s"""SELECT CAST(LEAST(FLOOR(l_quantity / 10.0) * 10, 40.0) AS BIGINT) AS bin,
         |  COUNT(*) AS n, ${oSum("l_extendedprice")} AS bin_price
         |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin
  )
}
