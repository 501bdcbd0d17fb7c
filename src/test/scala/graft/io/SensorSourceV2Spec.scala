package graft.io

import graft.SparkSpec
import graft.io.v2.SensorSourceV2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DataSourceV2 custom source: deterministic rows, partition-parallel
  * batch scan, micro-batch offsets advancing per trigger.
  */
class SensorSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.io.v2.SensorSourceV2"

  test("batch read: deterministic rows, all partitions covered") {
    val df = spark.read.format(fmt)
      .option("totalRows", "200").option("sensors", "5")
      .option("partitions", "4").load()
    assert(df.count() == 200)
    assert(df.select($"id").distinct().count() == 5)
    // law check: row 0 and row 7 match the shared generator
    val got = df.withColumn("i", ($"ts_us" / 1000000 - 1000).cast("long"))
      .filter($"i".isin(0L, 7L))
      .select($"i", $"id", $"temperature")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val e0 = SensorSourceV2.rowAt(0, 5, 1000L)
    val e7 = SensorSourceV2.rowAt(7, 5, 1000L)
    assert(got(0L) == ((e0._1, e0._3)))
    assert(got(7L) == ((e7._1, e7._3)))
  }

  test("micro-batch stream: offsets advance, rows accumulate per trigger") {
    val stream = spark.readStream.format(fmt)
      .option("rowsPerBatch", "50").option("sensors", "5").load()
    val q = stream.writeStream.format("memory").queryName("v2_out")
      .outputMode("append").trigger(Trigger.ProcessingTime("10 milliseconds"))
      .start()
    // wait until at least two micro-batches committed, then STOP before
    // asserting — counting a live 10ms-trigger stream races new batches
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table("v2_out").count() < 100 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    q.stop()
    val n = spark.table("v2_out").count()
    assert(n >= 100, s"expected >=100 rows after two batches, got $n")
    // exactly-once sequence: no duplicate (ts_us) values
    assert(spark.table("v2_out").select($"ts_us").distinct().count() == n)
  }
}
