package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")
  private def ev(rows: (Long, String, Long)*) =
    rows.map { case (u, t, sec) => (u, t, new Timestamp(sec * 1000L)) }
      .toDF("user_id", "event_type", "ts")
  private def reached(df: org.apache.spark.sql.DataFrame, windowSec: Long) =
    Funnel.reachedSteps(df, "user_id", "event_type", "ts", steps,
      windowUs = windowSec * 1000000L)
      .as[(Long, Long)].collect().toMap

  test("reachedSteps walks the full chain when every step converts in window") {
    val got = reached(ev(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 15L),
      (2L, "view", 0L), (2L, "click", 10L),
      (3L, "view", 0L),
      (4L, "click", 5L), (4L, "purchase", 6L)), windowSec = 100L)
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("greedy first-completion is WRONG under a window; valid-set reachability converts") {
    // view@0 and view@10; click@12. Window 5 s: the EARLIEST view can't
    // convert (click would need ts in (0, 5]) but the later view@10 can.
    val df = ev((1L, "view", 0L), (1L, "view", 10L), (1L, "click", 12L))
    // greedy à la q165 + window bound: min view ts, then min click in
    // (t1, t1 + W] — replicated inline to pin the divergence
    val t1 = 0L
    val greedyClick = Seq(12L).filter(t => t > t1 && t <= t1 + 5L)
    assert(greedyClick.isEmpty, "greedy finds no click — that's the trap")
    assert(reached(df, windowSec = 5L) == Map(1L -> 2L))
  }

  test("window bounds: inclusive at s + W, strict after s, per step") {
    // click exactly at view + W converts; purchase at click + W + 1 does not
    val got = reached(ev(
      (1L, "view", 0L), (1L, "click", 5L), (1L, "purchase", 11L),
      (2L, "view", 0L), (2L, "click", 5L), (2L, "purchase", 10L),
      // simultaneous events never chain (strict s < t)
      (3L, "view", 0L), (3L, "click", 0L)), windowSec = 5L)
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 1L))
  }

  test("the valid set carries FORWARD: step-3 may chain off a non-earliest click") {
    // clicks at 3 (valid) and 20 (invalid: no view within 5 before it);
    // purchase at 7 chains off click@3 even though a purchase within the
    // window of click@20 does not exist — and conversely purchase@24
    // must NOT convert via the invalid click@20
    val got = reached(ev(
      (1L, "view", 0L), (1L, "click", 3L), (1L, "click", 20L),
      (1L, "purchase", 24L)), windowSec = 5L)
    assert(got == Map(1L -> 2L),
      "purchase@24 may only chain off VALID clicks (3 is too far, 20 invalid)")
    val got2 = reached(ev(
      (1L, "view", 0L), (1L, "click", 3L), (1L, "click", 20L),
      (1L, "purchase", 7L)), windowSec = 5L)
    assert(got2 == Map(1L -> 3L))
  }

  test("reachedTimes returns the EARLIEST VALID time per step, min of the valid set") {
    // clicks at 3 and 8, views at 0 and 6, W = 5: valid clicks {3, 8};
    // purchase@12 chains off click@8 (12-8=4 <= 5) but NOT click@3 —
    // min R_3 = 12 even though the chain runs through the LATER click
    val got = Funnel.reachedTimes(ev(
      (1L, "view", 0L), (1L, "view", 6L), (1L, "click", 3L),
      (1L, "click", 8L), (1L, "purchase", 12L)),
      "user_id", "event_type", "ts", steps, windowUs = 5000000L)
      .as[(Long, Long, Seq[Long])].collect()
    assert(got.toSeq == Seq((1L, 3L,
      Seq(0L, 3000000L, 12000000L))))
    // and a user stopping mid-funnel gets exactly n_steps entries
    val got2 = Funnel.reachedTimes(ev((2L, "view", 7L), (2L, "click", 9L)),
      "user_id", "event_type", "ts", steps, windowUs = 5000000L)
      .as[(Long, Long, Seq[Long])].collect()
    assert(got2.toSeq == Seq((2L, 2L, Seq(7000000L, 9000000L))))
  }

  test("two-pointer reachability equals brute-force EXISTS chains on random event sets") {
    // the sweep's window bookkeeping is the fiddly part — check it
    // against the definition directly: R_k = { t : exists s in R_{k-1},
    // s < t <= s + W }, computed O(n^2) per user
    val rnd = new scala.util.Random(13)
    val types = steps
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(12).toLong, types(rnd.nextInt(3)), rnd.nextInt(40).toLong)
    }
    val wSec = 7L
    val got = reached(ev(rows: _*), windowSec = wSec)
    val want = rows.groupBy(_._1).map { case (u, evs) =>
      val byStep = types.map(t =>
        evs.filter(_._2 == t).map(_._3 * 1000000L).sorted)
      var prev = byStep.head
      var depth = if (prev.nonEmpty) 1 else 0
      (1 until types.length).foreach { k =>
        val valid = byStep(k).filter(t =>
          prev.exists(s => s < t && t <= s + wSec * 1000000L))
        prev = valid
        if (valid.nonEmpty) depth = k + 1
      }
      u -> depth.toLong
    }
    assert(got == want)
  }

  test("q171 counts step reach over the events table, monotone non-increasing") {
    val out = graft.SparkEntry.queries("q171_windowed_funnel")(
      spark, "/root/testdata/sf0.001")
      .select($"step", $"n_users").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 >= out(1)._2 && out(1)._2 >= out(2)._2)
    assert(out(0)._2 > 0)
    // and the windowed counts can never exceed the unwindowed q165 chain
    val greedy = graft.SparkEntry.queries("q165_funnel")(
      spark, "/root/testdata/sf0.001")
      .select($"step", $"n_users").as[(Long, Long)].collect()
      .sortBy(_._1)
    assert(out(0)._2 == greedy(0)._2) // step 1 has no window to apply
  }

  test("q181 SQL-text funnel equals the q171 operator form row for row") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, dir)
      .select($"step", $"step_name", $"n_users")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(rows("q181_funnel_sql") == rows("q171_windowed_funnel"))
  }

  test("q175 emits a row per step even with ZERO conversions (oracle parity)") {
    // the DuckDB oracle's scalar aggregates always emit one row per step
    // (n_users=0, NULL sums); the Spark side left-joins onto the literal
    // step frame to match — pinned on a views-only corpus
    val dir = java.nio.file.Files.createTempDirectory("funnel175").toString
    ev((1L, "view", 0L), (2L, "view", 60L))
      .write.parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q175_funnel_latency")(spark, dir)
      .select($"step", $"n_users", $"sum_latency_us", $"max_latency_us")
      .as[(Long, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, 0L, None, None), (3L, 0L, None, None)))
  }
}
