package graft.streaming

import graft.SparkSpec
import graft.streaming.Cep._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Golden semantics from the reference's login-fail and order-timeout
  * specs (LoginFail.scala:57-104 is the hand-rolled spec of the 3-fails
  * pattern; OrderTimeout.scala:50-128 of the pay-timeout pattern).
  */
case class Login(userId: Long, ip: String, eventType: String, ts: Timestamp)
case class Order(orderId: Long, eventType: String, txId: String, ts: Timestamp)

class CepSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private val threeFails = Pattern.begin[Login]("f1")(_.eventType == "fail")
    .next("f2")(_.eventType == "fail")
    .next("f3")(_.eventType == "fail")
    .within(5000L)

  test("batch CEP: three consecutive fails within 5s (LoginFailWithCep golden)") {
    val events = Seq(
      Login(1, "a", "fail", t(1)), Login(1, "a", "fail", t(2)),
      Login(1, "a", "fail", t(3)),                       // match
      Login(2, "b", "fail", t(1)), Login(2, "b", "success", t(2)),
      Login(2, "b", "fail", t(3)), Login(2, "b", "fail", t(4)), // broken by success
      Login(3, "c", "fail", t(1)), Login(3, "c", "fail", t(9)),
      Login(3, "c", "fail", t(10))                       // window exceeded for (1,9,10)
    ).toDS()
    val out = detectBatch(events)(_.userId.toString, _.ts.getTime, threeFails)
      .collect().filter(_.kind == "match")
    assert(out.map(_.key).toSeq == Seq("1"))
    assert(out.head.events.map(_.ts.getTime) == Seq(1000L, 2000L, 3000L))
  }

  test("batch CEP: overlapping matches fire per completing event") {
    val events = Seq.tabulate(4)(i => Login(7, "x", "fail", t(i + 1))).toDS()
    val out = detectBatch(events)(_.userId.toString, _.ts.getTime, threeFails)
      .collect().filter(_.kind == "match")
    // fails at 1,2,3,4 -> matches (1,2,3) and (2,3,4)
    assert(out.length == 2)
  }

  private val payPattern = Pattern.begin[Order]("create")(_.eventType == "create")
    .followedBy("pay")(_.eventType == "pay")
    .within(15 * 60 * 1000L)

  test("batch CEP: order pay timeout extraction (OrderTimeoutWithCEP golden)") {
    val events = Seq(
      Order(1, "create", "", t(0)), Order(1, "pay", "tx1", t(600)),   // paid in 10 min
      Order(2, "create", "", t(0)), Order(2, "pay", "tx2", t(1200)),  // paid too late
      Order(3, "create", "", t(0))                                    // never paid
    ).toDS()
    val out = detectBatch(events)(_.orderId.toString, _.ts.getTime, payPattern,
      emitTimeouts = true, endOfInputTimeouts = true).collect()
    val matches = out.filter(_.kind == "match").map(_.key).toSet
    val timeouts = out.filter(_.kind == "timeout").map(_.key).toSet
    assert(matches == Set("1"))
    assert(timeouts == Set("2", "3"))
  }

  test("streaming CEP: matches across micro-batches, timeout via watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Login]
    val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[Login]
    val results = detectStream(withWm)(_.userId.toString, _.ts.getTime,
        threeFails, emitTimeouts = true)
      .map(r => (r.key, r.kind, r.events.size))
    val q = results.writeStream.format("memory").queryName("cep_out")
      .outputMode("append").start()
    try {
      ms.addData(Login(1, "a", "fail", t(1)), Login(1, "a", "fail", t(2)))
      q.processAllAvailable()
      ms.addData(Login(1, "a", "fail", t(3))) // completes across batches
      q.processAllAvailable()
      ms.addData(Login(9, "z", "success", t(100))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("cep_out").as[(String, String, Int)].collect()
      assert(rows.contains(("1", "match", 3)))
    } finally q.stop()
  }

  test("streaming CEP: pattern without within() runs (deadline saturates)") {
    // regression: Pattern.begin defaults withinMs = Long.MaxValue;
    // firstTs + withinMs used to wrap negative, killing every partial and
    // feeding setTimeoutTimestamp an illegal pre-watermark instant.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val unbounded = Pattern.begin[Login]("f1")(_.eventType == "fail")
      .next("f2")(_.eventType == "fail") // no .within()
    val ms = MemoryStream[Login]
    val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[Login]
    val results = detectStream(withWm)(_.userId.toString, _.ts.getTime, unbounded)
      .map(r => (r.key, r.kind, r.events.size))
    val q = results.writeStream.format("memory").queryName("cep_unbounded")
      .outputMode("append").start()
    try {
      ms.addData(Login(1, "a", "fail", t(1))); q.processAllAvailable()
      // arbitrarily later: the partial must still be alive
      ms.addData(Login(1, "a", "fail", t(1000000))); q.processAllAvailable()
      val rows = spark.table("cep_unbounded").as[(String, String, Int)].collect()
      assert(rows.toSeq == Seq(("1", "match", 2)))
    } finally q.stop()
  }
}
