package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout plan gates: bucketing removes the join exchanges,
  * date partitioning prunes directories at the scan.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join without any Exchange") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_layout")
    // the warehouse directory outlives the in-memory catalog: a table dir
    // left by a previous JVM makes saveAsTable fail LOCATION_ALREADY_EXISTS
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_layout.$t")
      val loc = new java.io.File(s"spark-warehouse/graft_layout.db/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_totalprice")
    Layout.writeBucketed(li, "graft_layout.li_b", "l_orderkey", 8)
    Layout.writeBucketed(o, "graft_layout.o_b", "o_orderkey", 8)

    val joined = Layout.bucketedJoin(spark, "graft_layout.li_b",
      "graft_layout.o_b", "l_orderkey", "o_orderkey")
    // disable broadcast so the test observes the shuffle-vs-bucket choice
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==")(0)
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      // result parity with the plain join
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("date-partitioned write prunes partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("layout_part").toString
    val o = Tables.orders(spark, dir)
      .withColumn("order_month",
        date_format($"o_orderdate", "yyyy-MM"))
    Layout.writeDatePartitioned(o, s"$out/orders", "order_month")

    val read = spark.read.parquet(s"$out/orders")
      .filter($"order_month" === "1996-03")
    read.collect()
    val p = read.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters") && p.contains("order_month"),
      s"no partition pruning in:\n$p")
    // correctness: pruned read equals the row-filtered full read
    val expected = o.filter($"order_month" === "1996-03").count()
    assert(read.count() == expected && expected > 0)
  }
}
