package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class LRow(lts: Timestamp, lk: String, lv: Int)
case class RRow(rts: Timestamp, rk: String, rv: Int)

/** Golden I/O from the reference's window/interval join demos
  * (java/.../window/TumblingWindowJoinDemo.java:71-92 expected-output
  * block; java/.../transformation/IntervalJoinDemo.java between(-1s,1s)
  * upperBoundExclusive; java/.../window/TumblingWindowLeftJoinDemo
  * .java:56-84 left-outer semantics).
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  // the reference demo's event times (ms) and values
  private val leftRows = Seq(
    (1609512630000L, "a", 1), (1609512634999L, "a", 4),
    (1609512635000L, "b", 11), (1609512639999L, "c", 16),
    (1609512640000L, "b", 18))
  private val rightRows = Seq(
    (1609512630010L, "a", 10), (1609512634999L, "a", 40),
    (1609512635000L, "b", 110), (1609512639999L, "c", 160),
    (1609512640000L, "b", 180))
  // a far-future row per side to push the watermark past every window
  private val flushL = (1609999999000L, "zz", 0)
  private val flushR = (1609999999000L, "zz", 0)

  private def ts(ms: Long) = new Timestamp(ms)

  test("stream-stream tumbling window join (TumblingWindowJoinDemo golden)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lms = MemoryStream[LRow]
    val rms = MemoryStream[RRow]
    val joined = StreamJoins.windowJoin(lms.toDF(), rms.toDF(),
        "lts", "rts", "lk", "rk", "5 seconds", "0 seconds")
      .select($"lk", $"lv", $"rv")
    val q = joined.writeStream.format("memory").queryName("wj_out")
      .outputMode("append").start()
    try {
      lms.addData(leftRows.map(r => LRow(ts(r._1), r._2, r._3)): _*)
      rms.addData(rightRows.map(r => RRow(ts(r._1), r._2, r._3)): _*)
      q.processAllAvailable()
      val got = spark.table("wj_out").as[(String, Int, Int)].collect().toSet
      // the reference's expected-output block, as (key, lv, rv) tuples
      val expected = Set(
        ("a", 1, 10), ("a", 1, 40), ("a", 4, 10), ("a", 4, 40),
        ("b", 11, 110), ("c", 16, 160), ("b", 18, 180))
      assert(got == expected)
    } finally q.stop()
  }

  test("stream-stream interval join between(-1s,1s) upper-exclusive") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lms = MemoryStream[LRow]
    val rms = MemoryStream[RRow]
    val joined = StreamJoins.intervalJoin(lms.toDF(), rms.toDF(),
        "lts", "rts", "lk", "rk",
        "INTERVAL 1 SECOND", "INTERVAL 1 SECOND", "0 seconds")
      .select($"lk", $"lv", $"rv")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      lms.addData(leftRows.map(r => LRow(ts(r._1), r._2, r._3)): _*)
      rms.addData(rightRows.map(r => RRow(ts(r._1), r._2, r._3)): _*)
      q.processAllAvailable()
      val got = spark.table("ij_out").as[(String, Int, Int)].collect().toSet
      // r.ts in [l.ts-1000, l.ts+1000): the +-1s corridor pairs only
      val expected = Set(
        ("a", 1, 10), ("a", 4, 40), ("b", 11, 110), ("c", 16, 160),
        ("b", 18, 180), ("b", 18, 110))
      // (40000,b,18) vs (35000,b,110): 35000 not in [39000,41000) -> excluded
      assert(got == expected - (("b", 18, 110)))
    } finally q.stop()
  }

  test("stream-stream full-outer window join surfaces both unmatched sides") {
    // the streaming TxMatch shape: pays with no receipt AND receipts with
    // no pay both surface with nulls once the watermark closes the window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lms = MemoryStream[LRow]
    val rms = MemoryStream[RRow]
    val joined = StreamJoins.windowFullJoin(lms.toDF(), rms.toDF(),
        "lts", "rts", "lk", "rk", "5 seconds", "0 seconds")
      .select($"lk", $"rk", $"lv", $"rv")
    val q = joined.writeStream.format("memory").queryName("fj_out")
      .outputMode("append").start()
    try {
      lms.addData(LRow(ts(1609512630000L), "pay1", 1)) // matched
      lms.addData(LRow(ts(1609512631000L), "pay2", 2)) // no receipt
      rms.addData(RRow(ts(1609512630500L), "pay1", 10)) // matched
      rms.addData(RRow(ts(1609512632000L), "rcpt9", 90)) // no pay
      q.processAllAvailable()
      lms.addData(LRow(ts(flushL._1), flushL._2, flushL._3))
      rms.addData(RRow(ts(flushR._1), flushR._2, flushR._3))
      q.processAllAvailable()
      val got = spark.table("fj_out")
        .as[(Option[String], Option[String], Option[Int], Option[Int])]
        .collect().toSet
      assert(got.contains((Some("pay1"), Some("pay1"), Some(1), Some(10))))
      assert(got.contains((Some("pay2"), None, Some(2), None)))   // unmatched pay
      assert(got.contains((None, Some("rcpt9"), None, Some(90)))) // unmatched receipt
    } finally q.stop()
  }

  test("stream-stream left-outer window join emits null-extended rows on close") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lms = MemoryStream[LRow]
    val rms = MemoryStream[RRow]
    val joined = StreamJoins.windowLeftJoin(lms.toDF(), rms.toDF(),
        "lts", "rts", "lk", "rk", "5 seconds", "0 seconds")
      .select($"lk", $"lv", $"rv")
    val q = joined.writeStream.format("memory").queryName("lj_out")
      .outputMode("append").start()
    try {
      // left d,77 has no right-side partner in its window
      lms.addData((leftRows :+ ((1609512641000L, "d", 77)))
        .map(r => LRow(ts(r._1), r._2, r._3)): _*)
      rms.addData(rightRows.map(r => RRow(ts(r._1), r._2, r._3)): _*)
      q.processAllAvailable()
      // advance both watermarks far past every window to force the
      // null-extended emission for unmatched left rows
      lms.addData(LRow(ts(flushL._1), flushL._2, flushL._3))
      rms.addData(RRow(ts(flushR._1), flushR._2, flushR._3))
      q.processAllAvailable()
      val got = spark.table("lj_out").as[(String, Int, Option[Int])]
        .collect().toSet
      assert(got.contains(("d", 77, None)))          // left-outer null row
      assert(got.contains(("a", 1, Some(10))))       // inner rows intact
      assert(got.contains(("b", 18, Some(180))))
    } finally q.stop()
  }
}
