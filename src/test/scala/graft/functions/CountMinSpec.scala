package graft.functions

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 256

  test("CMS estimates overcount only and stay within the e/width bound; partitioning is irrelevant") {
    // zipf-ish: key k appears 200/k times
    val data = (1L to 40L).flatMap(k => Seq.fill((200 / k).toInt)(k))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new CountMinAgg(depth, width)
    val sk1 = data.toDS().select(agg.toColumn).head()
    val bound = math.ceil(math.E / width * data.size).toLong
    truth.foreach { case (k, n) =>
      val est = CountMin.estimate(sk1, k, depth, width)
      assert(est >= n, s"undercount for $k: $est < $n")
      assert(est <= n + bound, s"bound blown for $k: $est > $n + $bound")
    }
    // absent keys estimate at most the collision bound
    assert(CountMin.estimate(sk1, 99999L, depth, width) <= bound)
    // merge across partitions must give the identical sketch
    val sk8 = data.toDS().repartition(8).select(agg.toColumn).head()
    assert(java.util.Arrays.equals(sk1, sk8))
  }

  test("CMS sketch width must be a power of two") {
    intercept[IllegalArgumentException](new CountMinAgg(4, 1000))
  }

  test("CMS aggregates per event-time window in a stream (udaf form)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val cms = udaf(new CountMinAgg(depth, width),
      org.apache.spark.sql.Encoders.scalaLong)
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(window($"ts", "1 minute"))
      .agg(cms($"id").as("sk"))
      .select($"window.start".cast("long").as("w"), $"sk")
      .writeStream.format("memory").queryName("cms_win")
      .outputMode("complete").start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      // window 1: id 7 three times, id 9 once; window 2: id 7 once
      ms.addData((7L, t(10)), (7L, t(20)), (9L, t(30)), (7L, t(40)), (7L, t(70)))
      q.processAllAvailable()
      val sketches = spark.table("cms_win").as[(Long, Array[Byte])]
        .collect().toMap
      assert(sketches.keySet == Set(0L, 60L))
      assert(CountMin.estimate(sketches(0L), 7L, depth, width) >= 3)
      assert(CountMin.estimate(sketches(0L), 9L, depth, width) >= 1)
      assert(CountMin.estimate(sketches(60L), 7L, depth, width) >= 1)
      assert(CountMin.estimate(sketches(60L), 9L, depth, width) <= 1)
    } finally q.stop()
  }
}
