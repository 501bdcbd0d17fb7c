package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private def words = docs.select($"source",
    explode(split(trim($"text"), "\\s+")).as("w"))

  test("per-group estimates are exact at coupon-mode cardinalities") {
    val got = Sketches.estimate(Sketches.distinctSketch(words, "source", "w"))
      .select($"source", $"n_rows", $"distinct_est")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = words.groupBy($"source")
      .agg(count(lit(1)).as("n"), countDistinct($"w").as("d"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
  }

  test("merge of split halves equals the sketch of the whole") {
    val a = Sketches.distinctSketch(words.filter(xxhash64($"w") % 2 === 0),
      "source", "w")
    val b = Sketches.distinctSketch(words.filter(xxhash64($"w") % 2 =!= 0),
      "source", "w")
    val merged = Sketches.estimate(Sketches.mergeSketches(a, b, "source"))
      .select($"source", $"n_rows", $"distinct_est")
      .as[(String, Long, Long)].collect().toSet
    val whole = Sketches.estimate(Sketches.distinctSketch(words, "source", "w"))
      .select($"source", $"n_rows", $"distinct_est")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("incremental update scans only the batch and matches a full rebuild") {
    val old = words.filter($"source" =!= "src0")
    val batch = words.filter($"source" === "src0")
    val stored = Sketches.distinctSketch(old, "source", "w")
    val updated = Sketches.estimate(
        Sketches.updateWith(stored, batch, "source", "w"))
      .select($"source", $"distinct_est").as[(String, Long)].collect().toSet
    val full = Sketches.estimate(Sketches.distinctSketch(words, "source", "w"))
      .select($"source", $"distinct_est").as[(String, Long)].collect().toSet
    assert(updated == full)
  }

  test("global rollup has distinct-union semantics, not per-group addition") {
    val perGroup = Sketches.distinctSketch(words, "source", "w")
    val g = Sketches.globalEstimate(perGroup)
      .select($"n_rows", $"distinct_est").as[(Long, Long)].head()
    assert(g._1 == words.count())
    assert(g._2 == words.select($"w").distinct().count())
    // the same vocab appears in every source, so summing per-group
    // distincts would overcount — the union must not
    val summed = Sketches.estimate(perGroup)
      .agg(sum($"distinct_est")).as[Long].head()
    assert(g._2 < summed, "global union should dedup across groups")
  }

  test("streaming maintenance: store converges to full-corpus estimates; replayed batch is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sk_stream").toString
    val store = s"$base/store"; val ledger = s"$base/ledger"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = Sketches.maintainDistinctSketches(
        ms.toDF().toDF("source", "w"), "source", "w", store, ledger)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      val rows = words.select($"source", $"w").as[(String, String)]
        .collect().toSeq
      val (h1, h2) = rows.splitAt(rows.size / 2)
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
      val got = Sketches.estimate(spark.read.parquet(store))
        .select($"source", $"n_rows", $"distinct_est")
        .as[(String, Long, Long)].collect().toSet
      val want = words.groupBy($"source")
        .agg(count(lit(1)).as("n"), countDistinct($"w").as("d"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, "store must equal a full-corpus build after 2 batches")
      // ledger: re-running an already-committed batchId changes nothing
      // (n_rows would otherwise double; estimates are HLL-idempotent)
      val replay = h1.toDF("source", "w")
      graft.io.Sinks.runIdempotent(replay, 0L, ledger) { (b, _) =>
        Sketches.mergeBatchIntoStore(b, "source", "w", store)
      }
      val after = Sketches.estimate(spark.read.parquet(store))
        .select($"source", $"n_rows", $"distinct_est")
        .as[(String, Long, Long)].collect().toSet
      assert(after == got, "replayed batch must be a no-op")
    } finally q.stop()
  }

  test("streaming ROLLUP-cube maintenance: store == whole-corpus cube; replayed batch is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("cube_stream").toString
    val store = s"$base/store"; val ledger = s"$base/ledger"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val q = Sketches.maintainDistinctRollup(
        ms.toDF().toDF("et", "day", "user"), Seq("et", "day"), "user",
        store, ledger)
      .option("checkpointLocation", s"$base/ckpt").start()
    // users OVERLAP across batches and days: subtotal cells must be
    // distinct unions, never sums of per-batch counts
    val all = Seq(
      ("view", 1L, 10L), ("view", 1L, 11L), ("view", 2L, 10L),
      ("click", 1L, 10L), ("click", 2L, 12L),
      ("view", 2L, 11L), ("view", 1L, 10L), ("click", 1L, 11L),
      ("click", 2L, 10L), ("view", 2L, 13L))
    try {
      val (b1, b2) = all.splitAt(5)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) =
        df.select($"et", $"day", $"gid", $"n_rows", $"distinct_est")
          .as[(Option[String], Option[Long], Long, Long, Long)]
          .collect().toSet
      val got = cells(spark.read.parquet(store))
      // exact whole-corpus reference: coupon-mode HLL == COUNT(DISTINCT)
      val exact = cells(all.toDF("et", "day", "user")
        .rollup($"et", $"day")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          countDistinct($"user").as("distinct_est")))
      assert(got == exact, "maintained cube must equal the whole-corpus cube")
      // ledger: re-running an already-committed batchId changes nothing
      graft.io.Sinks.runIdempotent(b1.toDF("et", "day", "user"), 0L, ledger) {
        (b, _) => Sketches.mergeRollupIntoStore(b, Seq("et", "day"), "user", store)
      }
      assert(cells(spark.read.parquet(store)) == got,
        "replayed batch must be a no-op")
    } finally q.stop()
  }

  test("slidingDistinctUnion is a UNION over the window, never a sum") {
    // user 1 active every day 1..3, user 2 only day 3: window-3 distinct
    // at day 3 is 2 (sum of daily distincts would say 4); gap day 5
    // (day 4 unobserved) unions in-window day 3's {1,2} with its own {3}
    val act = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 5L))
      .toDF("user", "day")
    val daily = Sketches.distinctSketch(act, "day", "user")
    val got = Sketches.slidingDistinctUnion(daily, "day", window = 3)
      .select($"day", $"window_est").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 5L -> 3L))
    // only observed days emit rows (day 4 pruned)
    assert(!got.contains(4L))
  }

  test("DAU/WAU live: maintained daily sketches feed slidingDistinctUnion, late days included") {
    // the q185 dashboard's streaming story needs NO new operator: the
    // day-keyed maintainDistinctSketches store IS the daily-sketch
    // table, and the window union is a batch finisher over it; a LATE
    // (day 1, user 2) in batch 2 re-unions into day 1's stored sketch
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("dauwau").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = Sketches.maintainDistinctSketches(
        ms.toDF().toDF("day", "user"), "day", "user",
        s"$base/store", s"$base/ledger")
      .option("checkpointLocation", s"$base/ckpt").start()
    val b1 = Seq((1L, 1L), (2L, 1L), (3L, 1L), (3L, 2L))
    val b2 = Seq((5L, 3L), (1L, 2L)) // day-1 row arrives a batch late
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      def wau(daily: org.apache.spark.sql.DataFrame) =
        Sketches.slidingDistinctUnion(daily, "day", window = 3)
          .select($"day", $"window_est").as[(Long, Long)].collect().toMap
      val streamed = wau(spark.read.parquet(s"$base/store"))
      val batch = wau(Sketches.distinctSketch(
        (b1 ++ b2).toDF("day", "user"), "day", "user"))
      assert(streamed == batch)
      assert(streamed == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 5L -> 3L))
    } finally q.stop()
  }

  test("discoverGrid fits the minimal covering power-of-two grid, width-aligned") {
    val g = Sketches.discoverGrid(Seq(-5L, 3L, 100L).toDF("v"), "v", 8)
    assert(g == Sketches.Grid(-16L, 16L, 8))
    // minimality: the next-narrower power of two cannot cover from its
    // own aligned lo (alignDown(-5, 8) = -8; 100 - (-8) = 108 >= 64)
    assert(100L - (-8L) >= 8L * 8L)
    // degenerate single value: unit width anchored at the value
    assert(Sketches.discoverGrid(Seq(7L).toDF("v"), "v", 4) ==
      Sketches.Grid(7L, 1L, 4))
    // all-null input fails loudly instead of inventing a grid
    intercept[IllegalArgumentException] {
      Sketches.discoverGrid(Seq(Option.empty[Long]).toDF("v"), "v", 4)
    }
  }

  test("histogramSketchAuto == histogramSketch given the grid it discovered") {
    val df = Seq(("a", -5L), ("a", 3L), ("a", 100L), ("b", 40L), ("b", 99L))
      .toDF("g", "v")
    val (auto, g) = Sketches.histogramSketchAuto(df, "g", "v", 8)
    val manual = Sketches.histogramSketch(df, "g", "v",
      g.lo.toDouble, g.hi.toDouble, g.nBuckets)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"g", $"n", $"counts").as[(String, Long, Seq[Long])]
        .collect().toSet
    assert(rows(auto) == rows(manual))
    // every value inside the grid: counts account for all rows
    assert(rows(auto).toSeq.map(_._2).sum == 5L)
  }

  test("histogram sketch: exact bucket counts, clamped edges") {
    val df = Seq(("a", -5.0), ("a", 0.0), ("a", 63.9), ("a", 64.0),
      ("a", 500.0), ("a", 2000.0), ("b", 100.0))
      .toDF("g", "v")
    val sk = Sketches.histogramSketch(df, "g", "v", 0.0, 1024.0, 16)
      .select($"g", $"n", $"counts").as[(String, Long, Seq[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // a: -5 and 0 and 63.9 clamp/fall into bucket 0; 64 -> b1; 500 -> b7;
    // 2000 clamps into b15
    assert(sk("a")._1 == 6)
    assert(sk("a")._2 == Seq(3L, 1L, 0L, 0L, 0L, 0L, 0L, 1L,
      0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(sk("b")._2(1) == 1L && sk("b")._1 == 1)
  }

  test("histogram sketch drops null/NaN values instead of clamping them") {
    val df = Seq(("a", Some(10.0)), ("a", None),
      ("a", Some(Double.NaN))).toDF("g", "v")
    val sk = Sketches.histogramSketch(df, "g", "v", 0.0, 1024.0, 16)
      .select($"n", $"counts").as[(Long, Seq[Long])].head()
    assert(sk._1 == 1 && sk._2.sum == 1)
  }

  test("integer histogram == double histogram inside the exactness window") {
    val rnd = new scala.util.Random(51)
    val rows = Seq.tabulate(400)(i =>
      (s"g${i % 3}", rnd.nextLong() % 100000L))
    val df = spark.createDataset(rows).toDF("g", "v")
    def norm(sk: org.apache.spark.sql.DataFrame) =
      sk.select($"g", $"n", $"counts").as[(String, Long, Seq[Long])]
        .collect().toSet
    val intSk = Sketches.histogramSketchIntBy(df, Seq("g"), "v",
      lo = -100000L, width = 12800L, nBuckets = 16)
    val dblSk = Sketches.histogramSketch(df, "g", "v",
      -100000.0, -100000.0 + 12800.0 * 16, 16)
    assert(norm(intSk) == norm(dblSk))
  }

  test("bucketIdxInt stays exact at magnitudes where the double grid drifts") {
    // 2^53 + 1 is not representable as a double: the double path rounds
    // it onto 2^53 and buckets it LOW; the integer path keeps it exact.
    // This is exactly the adjacent-bucket disagreement percentileBySketch
    // must never see between its histogram and probe sides.
    val big = (1L << 53) + 1L
    val lo = (1L << 53) - 4L
    val df = Seq(big).toDF("v")
    val ib = df.select(Sketches.bucketIdxInt($"v", lo, 2L, 4).as("b"))
      .head().getLong(0)
    assert(ib == 2L, s"integer path must see (2^53+1) - lo = 5 -> bucket 2, got $ib")
    // and the shared-bucketization histogram agrees with its own probe
    val sk = Sketches.histogramSketchIntBy(df.withColumn("g", lit("x")),
      Seq("g"), "v", lo, 2L, 4)
      .select($"counts").as[Seq[Long]].head()
    assert(sk(2) == 1L, s"histogram must count the row in bucket 2: $sk")
  }

  test("histogram merge of split halves equals the sketch of the whole") {
    val docs0 = docs.select($"source", $"n_chars")
    val a = Sketches.histogramSketch(
      docs0.filter(xxhash64($"n_chars") % 2 === 0),
      "source", "n_chars", 0.0, 1024.0, 16)
    val b = Sketches.histogramSketch(docs0.filter(xxhash64($"n_chars") % 2 =!= 0),
      "source", "n_chars", 0.0, 1024.0, 16)
    val merged = Sketches.mergeHistograms(a, b, "source")
      .select($"source", $"n", $"counts").as[(String, Long, Seq[Long])]
      .collect().toSet
    val whole = Sketches.histogramSketch(docs0, "source", "n_chars",
      0.0, 1024.0, 16)
      .select($"source", $"n", $"counts").as[(String, Long, Seq[Long])]
      .collect().toSet
    assert(merged == whole)
  }

  test("histogram quantiles: within a bucket width of exact, monotone in q") {
    val sk = Sketches.histogramSketch(docs, "source", "n_chars",
      0.0, 1024.0, 16)
    val est = Sketches.quantilesFromHistogram(sk, "source",
      0.0, 1024.0, 16, Seq(0.5, 0.9))
      .select($"source", $"q", $"est").as[(String, Double, Double)]
      .collect().groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exact = docs.groupBy($"source")
      .agg(expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    est.foreach { case (src, qs) =>
      assert(qs(0.5) <= qs(0.9), s"$src: p50 ${qs(0.5)} > p90 ${qs(0.9)}")
      assert(math.abs(qs(0.5) - exact(src)._1) <= 64.0,
        s"$src p50 ${qs(0.5)} vs exact ${exact(src)._1}")
      assert(math.abs(qs(0.9) - exact(src)._2) <= 64.0,
        s"$src p90 ${qs(0.9)} vs exact ${exact(src)._2}")
    }
  }

  test("sketches survive a parquet round-trip and keep merging") {
    val path = java.nio.file.Files.createTempDirectory("hll_store").toString
    Sketches.distinctSketch(words, "source", "w")
      .write.parquet(s"$path/sketches")
    val stored = spark.read.parquet(s"$path/sketches")
    val updated = Sketches.estimate(
        Sketches.updateWith(stored, words, "source", "w"))
      .select($"source", $"distinct_est").as[(String, Long)].collect().toSet
    // re-adding the same keys must not change any distinct estimate
    val base = Sketches.estimate(stored)
      .select($"source", $"distinct_est").as[(String, Long)].collect().toSet
    assert(updated == base)
  }

  test("distinctRollup: one HLL per grouping set, equal to exact COUNT(DISTINCT) at coupon scale") {
    val df = (1 to 300).map { i =>
      (s"t${i % 3}", (i % 5).toLong, (i % 40).toLong)
    }.toDF("event_type", "day", "user")
    val got = Sketches.distinctRollup(df, Seq("event_type", "day"), "user")
      .select($"event_type", $"day", $"gid", $"n_rows", $"distinct_est")
      .as[(Option[String], Option[Long], Long, Long, Long)]
      .collect().map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    val exact = df.rollup($"event_type", $"day")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        countDistinct($"user").as("d"))
      .select($"event_type", $"day", $"gid", $"n", $"d")
      .as[(Option[String], Option[Long], Long, Long, Long)]
      .collect().map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    assert(got.keySet == exact.keySet)
    // detail cells, per-type subtotals AND the grand total all match the
    // exact tier: true distinct-union semantics per grouping set (a sum
    // of child cells would overcount 3x here)
    assert(got == exact)
    assert(got((None, None, 3L))._2 == 40L)
  }

  test("mergeDistinctRollups: split halves merge to the whole cube, per grouping set") {
    val df = (1 to 300).map { i =>
      (s"t${i % 3}", (i % 5).toLong, (i % 40).toLong)
    }.toDF("event_type", "day", "user")
    def key(r: (Option[String], Option[Long], Long, Long, Long)) =
      (r._1, r._2, r._3) -> ((r._4, r._5))
    val whole = Sketches.distinctRollup(df, Seq("event_type", "day"), "user")
      .select($"event_type", $"day", $"gid", $"n_rows", $"distinct_est")
      .as[(Option[String], Option[Long], Long, Long, Long)]
      .collect().map(key).toMap
    // split on the row index so users OVERLAP across halves (user u
    // recurs at idx u+40k, and 40 % 3 != 0 spreads its occurrences over
    // both sides): the merge must distinct-union registers, not add
    val idxed = (1 to 300).map { i =>
      (i.toLong, s"t${i % 3}", (i % 5).toLong, (i % 40).toLong)
    }.toDF("idx", "event_type", "day", "user")
    val a = Sketches.distinctRollup(
      idxed.filter($"idx" % 3 === 0), Seq("event_type", "day"), "user")
    val b = Sketches.distinctRollup(
      idxed.filter($"idx" % 3 =!= 0), Seq("event_type", "day"), "user")
    val merged = Sketches.mergeDistinctRollups(a, b, Seq("event_type", "day"))
      .select($"event_type", $"day", $"gid", $"n_rows", $"distinct_est")
      .as[(Option[String], Option[Long], Long, Long, Long)]
      .collect().map(key).toMap
    assert(merged == whole)
  }

  test("streaming histogram maintenance: store == full-corpus histogram; replayed batch is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("hist_stream").toString
    val store = s"$base/store"; val ledger = s"$base/ledger"
    val grid = Sketches.Grid(lo = 0L, width = 64L, nBuckets = 16)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source", $"n_chars")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = Sketches.maintainHistograms(
        ms.toDF().toDF("source", "n_chars"), "source", "n_chars", grid,
        store, ledger)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      val rows = docs.as[(String, Long)].collect().toSeq
      val (h1, h2) = rows.splitAt(rows.size / 2)
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select($"source", $"n", $"counts")
          .as[(String, Long, Seq[Long])].collect().toSet
      val got = rowsOf(spark.read.parquet(store))
      val want = rowsOf(Sketches.histogramSketch(docs, "source", "n_chars",
        grid.lo.toDouble, grid.hi.toDouble, grid.nBuckets))
      assert(got == want, "store must equal a full-corpus build after 2 batches")
      // histogram counts ADD — without the ledger a replayed batch would
      // double them; with it, nothing changes
      graft.io.Sinks.runIdempotent(h1.toDF("source", "n_chars"), 0L, ledger) {
        (b, _) => Sketches.mergeHistogramsIntoStore(b, "source", "n_chars",
          grid, store)
      }
      assert(rowsOf(spark.read.parquet(store)) == got,
        "replayed batch must be a no-op")
      // the maintained store serves the same quantiles as the batch build
      val qGot = Sketches.quantilesFromHistogram(spark.read.parquet(store),
          "source", grid.lo.toDouble, grid.hi.toDouble, grid.nBuckets,
          Seq(0.5, 0.9))
        .select($"source", $"q", $"est").as[(String, Double, Double)]
        .collect().toSet
      val qWant = Sketches.quantilesFromHistogram(
          Sketches.histogramSketch(docs, "source", "n_chars",
            grid.lo.toDouble, grid.hi.toDouble, grid.nBuckets),
          "source", grid.lo.toDouble, grid.hi.toDouble, grid.nBuckets,
          Seq(0.5, 0.9))
        .select($"source", $"q", $"est").as[(String, Double, Double)]
        .collect().toSet
      assert(qGot == qWant)
    } finally q.stop()
  }
}
