package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val grid = Sketches.Grid(lo = 0L, width = 8L, nBuckets = 8)

  /** Reference PSI in plain Scala doubles — same smoothing, same
    * per-term micro rounding — for brute-force comparison.
    */
  private def psiMicroRef(a: Seq[Long], b: Seq[Long], g: Sketches.Grid): Long = {
    def hist(xs: Seq[Long]): Array[Long] = {
      val h = new Array[Long](g.nBuckets)
      xs.foreach { v =>
        val i = math.min(g.nBuckets - 1,
          math.max(0, ((v - g.lo).toDouble / g.width).toInt))
        h(i) += 1
      }
      h
    }
    val (ha, hb) = (hist(a), hist(b))
    (0 until g.nBuckets).map { i =>
      val pa = (ha(i) + 1).toDouble / (a.size + g.nBuckets)
      val pb = (hb(i) + 1).toDouble / (b.size + g.nBuckets)
      math.floor((pa - pb) * math.log(pa / pb) * 1e6 + 0.5).toLong
    }.sum
  }

  test("identical snapshots have PSI exactly zero") {
    val xs = Seq(1L, 5L, 9L, 17L, 33L, 60L).map(("g", _)).toDF("g", "v")
    val got = Drift.psiReport(xs, xs, "g", "v", grid)
      .select($"g", $"n_a", $"n_b", $"psi_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("g", 6L, 6L, 0L)))
  }

  test("psi matches the double-precision reference per group") {
    val a = Seq(0L, 1L, 2L, 3L, 9L, 10L, 17L, 25L, 26L, 40L)
    val b = Seq(30L, 33L, 35L, 40L, 41L, 42L, 50L, 60L, 61L, 63L, 5L)
    val df = (a.map(("ga", _)) ++ b.map(("gb", _))).toDF("g", "v")
    val got = Drift.psiReport(
        df.filter($"g" === "ga").select(lit("x").as("g"), $"v"),
        df.filter($"g" === "gb").select(lit("x").as("g"), $"v"),
        "g", "v", grid)
      .select($"psi_micro").as[Long].head()
    assert(got == psiMicroRef(a, b, grid))
    assert(got > 0L, "disjoint-ish distributions must register drift")
  }

  test("a group present in only one snapshot drifts against the empty histogram") {
    val a = Seq(("only_a", 3L), ("both", 5L)).toDF("g", "v")
    val b = Seq(("both", 5L), ("only_b", 60L)).toDF("g", "v")
    val got = Drift.psiReport(a, b, "g", "v", grid)
      .select($"g", $"n_a", $"n_b", $"psi_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set("only_a", "both", "only_b"))
    assert(got("both") == ((1L, 1L, 0L)))
    val (na, nb, psiA) = got("only_a")
    assert(na == 1L && nb == 0L && psiA == psiMicroRef(Seq(3L), Seq(), grid))
    assert(psiA > 0L)
  }

  test("live drift: PSI between two MAINTAINED histogram stores == batch psiReport") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("psi_live").toString
    val a = Seq(0L, 1L, 2L, 9L, 17L, 25L, 40L).map(("g", _))
    val b = Seq(30L, 33L, 40L, 50L, 60L, 61L).map(("g", _))
    def maintain(rows: Seq[(String, Long)], tag: String): String = {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long)]
      val q = Sketches.maintainHistograms(ms.toDF().toDF("g", "v"), "g", "v",
          grid, s"$base/$tag/store", s"$base/$tag/ledger")
        .option("checkpointLocation", s"$base/$tag/ckpt").start()
      try {
        val (h1, h2) = rows.splitAt(rows.size / 2)
        ms.addData(h1); q.processAllAvailable()
        ms.addData(h2); q.processAllAvailable()
      } finally q.stop()
      s"$base/$tag/store"
    }
    val (sa, sb) = (maintain(a, "a"), maintain(b, "b"))
    val live = Drift.psiFromHistograms(spark.read.parquet(sa),
        spark.read.parquet(sb), "g", grid.nBuckets)
      .select($"g", $"n_a", $"n_b", $"psi_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = Drift.psiReport(a.toDF("g", "v"), b.toDF("g", "v"),
        "g", "v", grid)
      .select($"g", $"n_a", $"n_b", $"psi_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(live == batch)
    assert(live.head._4 == psiMicroRef(a.map(_._2), b.map(_._2), grid))
  }

  test("a NULL group matches itself across snapshots (null-safe join, no false alarm)") {
    // histogramSketch keeps a null-group sketch row; a plain full-outer
    // equality join would split it into two spurious appear/vanish rows
    val a = Seq((Option.empty[String], 5L), (Some("g"), 5L),
      (Option.empty[String], 9L)).toDF("g", "v")
    val got = Drift.psiReport(a, a, "g", "v", grid)
      .select($"g", $"n_a", $"n_b", $"psi_micro")
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(got == Set((None, 2L, 2L, 0L), (Some("g"), 1L, 1L, 0L)),
      s"null group must be ONE zero-drift row: $got")
  }

  test("PSI properties on random snapshots: symmetric, non-negative, zero iff identical") {
    val rnd = new scala.util.Random(17)
    for (round <- 1 to 3) {
      val a = Seq.fill(200)(("g", rnd.nextInt(64).toLong))
      val b = Seq.fill(150)(("g", rnd.nextInt(64).toLong))
      def psi(x: Seq[(String, Long)], y: Seq[(String, Long)]): Long =
        Drift.psiReport(x.toDF("g", "v"), y.toDF("g", "v"), "g", "v", grid)
          .select($"psi_micro").as[Long].head()
      val ab = psi(a, b)
      // every term (pa-pb)·ln(pa/pb) is non-negative, and the formula
      // is invariant under swapping the snapshots
      assert(ab >= 0L, s"round $round: negative PSI $ab")
      assert(ab == psi(b, a), s"round $round: PSI not symmetric")
      assert(psi(a, a) == 0L, s"round $round: identical snapshots drift")
    }
  }

  test("diversityReport: ln-micro entropy, top share, degenerate single group") {
    def entMicro(counts: Seq[Long]): Long = {
      val t = counts.sum.toDouble
      counts.map(n => math.floor(-(n / t) * math.log(n / t) * 1e6 + 0.5).toLong).sum
    }
    val df = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++
      Seq("d") ++ Seq(null.asInstanceOf[String])).toDF("g")
    val got = Drift.diversityReport(df, "g")
      .select($"dim", $"n_groups", $"n_rows", $"entropy_micro",
        $"top_share_micro")
      .as[(String, Long, Long, Long, Long)].head()
    // nulls dropped: 10 rows over 4 groups; top share = 4e6 div 10
    assert(got == (("g", 4L, 10L, entMicro(Seq(4L, 3L, 2L, 1L)), 400000L)))
    val single = Drift.diversityReport(Seq("x", "x").toDF("g"), "g")
      .select($"entropy_micro", $"top_share_micro").as[(Long, Long)].head()
    assert(single == ((0L, 1000000L)), "one group: zero entropy, full share")
  }

  test("psiByDimension isolates the drifted coordinate") {
    // dim 0 identical across snapshots, dim 1 shifted wholesale
    val a = Seq(("g", Seq(0.1f, 0.1f)), ("g", Seq(0.2f, 0.15f)),
      ("g", Seq(0.3f, 0.2f)))
    val b = Seq(("g", Seq(0.1f, 0.5f)), ("g", Seq(0.2f, 0.55f)),
      ("g", Seq(0.3f, 0.6f)))
    val grid = Sketches.Grid(lo = 0L, width = 65536L, nBuckets = 16)
    val got = Drift.psiByDimension(a.toDF("g", "v"), b.toDF("g", "v"),
        "g", "v", grid)
      .select($"dim", $"n_a", $"n_b", $"psi_micro")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == 0L, "identical marginal must read zero drift")
    assert(got(1L) > 0L, "shifted marginal must register")
    // and each dimension's PSI equals the scalar psiReport on that slice
    def slice(rows: Seq[(String, Seq[Float])], d: Int) =
      rows.map { case (g, v) =>
        (g, math.floor(v(d).toDouble * 1e6 + 0.5).toLong)
      }.toDF("g", "vm")
    val scalar1 = Drift.psiReport(slice(a, 1), slice(b, 1), "g", "vm", grid)
      .select($"psi_micro").as[Long].head()
    assert(got(1L) == scalar1)
  }

  test("psiReportAuto discovers the union grid and equals the manual call") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val (auto, g) = Drift.psiReportAuto(a, b, "lang", "n_chars", nBuckets = 16)
    val wantGrid = Sketches.discoverGrid(
      a.select($"n_chars").unionByName(b.select($"n_chars")), "n_chars", 16)
    assert(g == wantGrid)
    val gotRows = auto.select($"lang", $"n_a", $"n_b", $"psi_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    val manual = Drift.psiReport(a, b, "lang", "n_chars", g)
      .select($"lang", $"n_a", $"n_b", $"psi_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(gotRows == manual)
    // even/odd halves of the same corpus: drift should be small but the
    // report must still emit one finite row per language
    assert(gotRows.nonEmpty && gotRows.forall(_._4 >= 0L))
  }
}
