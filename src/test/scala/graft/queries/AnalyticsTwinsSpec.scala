package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Round-14 analytics twins: SQL-text forms against their operator
  * forms, and the linear-attribution credit law on a hand fixture.
  */
class AnalyticsTwinsSpec extends SparkSpec {
  import spark.implicits._

  test("q187 SQL-text funnel latency equals the q175 operator form row for row") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, dir)
      .select($"step", $"n_users", $"sum_latency_us", $"max_latency_us")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
      .sortBy(_._1)
    assert(rows("q187_funnel_latency_sql") == rows("q175_funnel_latency"))
  }

  test("q188 splits each purchase's credit equally across qualifying clicks") {
    val dir = java.nio.file.Files.createTempDirectory("linattr").toString
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val day = 86400L
    Seq(
      // purchase 100: clicks at -1h and -2h qualify -> 500000 each
      (1L, "click", t(10 * day - 3600), 1L),
      (1L, "click", t(10 * day - 7200), 2L),
      (1L, "purchase", t(10 * day), 100L),
      // purchase 101: three clicks -> 333333 each (floor; 1 micro lost)
      (2L, "click", t(11 * day - 10), 3L),
      (2L, "click", t(11 * day - 20), 4L),
      (2L, "click", t(11 * day - 30), 5L),
      (2L, "purchase", t(11 * day), 101L),
      // out of the 3-day lookback AND after the purchase: no credit
      (1L, "click", t(10 * day - 4 * day), 6L),
      (1L, "click", t(10 * day + 5), 7L),
      // purchase with no qualifying click: absent from the report
      (3L, "purchase", t(12 * day), 102L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q188_linear_attribution")(spark, dir)
      .select($"day_num", $"n_clicks_credited", $"n_purchases_touched",
        $"sum_credit_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // day 9: purchase 100's two clicks (ts 10d-1h/-2h fall on day 9 UTC);
    // day 10: purchase 101's three clicks land on day 10 (11d - seconds)
    assert(got == Seq((9L, 2L, 1L, 1000000L), (10L, 3L, 1L, 999999L)))
  }
}
