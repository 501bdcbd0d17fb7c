package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench loop's failure contract: a query that throws must report -1.0
  * (not a tiny elapsed time that reads as a fast success), and a failure in
  * one query must not disturb its neighbors' timings.
  */
class BenchSpec extends SparkSpec {

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("n")

  test("measure marks a throwing query -1 and times healthy neighbors") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("injected")
    val out = Bench.measure(spark, "unused",
      Seq("q900_ok" -> ok, "q901_boom" -> boom, "q902_ok" -> ok), runs = 2).toMap
    assert(out("q901_boom") == -1.0)
    assert(out("q900_ok") > 0.0 && out("q902_ok") > 0.0)
  }

  test("measure marks a query that fails on only one run -1 (flaky = failed)") {
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls == 2) throw new IllegalStateException("injected flake")
      s.range(5).toDF("n")
    }
    val out = Bench.measure(spark, "unused", Seq("q903_flaky" -> flaky), runs = 2).toMap
    assert(out("q903_flaky") == -1.0)
  }

  test("measure keeps best-of-runs semantics for healthy queries") {
    val out = Bench.measure(spark, "unused", Seq("q904_ok" -> ok), runs = 2).toMap
    assert(out("q904_ok") > 0.0)
  }

  test("benchLine carries the COMPLETE map at the CURRENT query count under typical values") {
    // the driver regex-parses the JSON line from the last 2000 stdout
    // chars (sbt's success trailer eats ~75). With the typical value mix
    // (sub-second majority at 1 decimal, a slow tail at 2) EVERY
    // registered gate query must make it onto the line — if this fails,
    // the surface outgrew the window and the slowest-first fallback is
    // now the steady state: update BASELINE.md to say so.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 12 == 0) 12.34 else 0.56) // ~8% slow tail, like sf0.1
    }
    val line = Bench.benchLine(results, "0.1")
    assert(line.length <= Bench.lineBudget,
      s"bench line ${line.length} > budget ${Bench.lineBudget} at " +
        s"${results.size} queries")
    names.foreach { n =>
      val k = "\"" + n.split("_")(0).stripPrefix("q") + "\":"
      assert(line.contains(k), s"query $n missing from the bench line")
    }
  }

  test("benchLine past the budget keeps the sentinel + slowest queries, still parseable") {
    // 500 synthetic queries at mixed speeds: the full map cannot fit, so
    // the fallback must keep q104 and prefer the SLOW tail over the fast
    val many = (200 to 700).map(i => s"q${i}_synthetic" -> (if (i % 10 == 0) 90.0 + i / 100.0 else 0.11))
    val results = ("q104_sentinel" -> 1.23) +: many
    val line = Bench.benchLine(results, "0.1")
    assert(line.length <= Bench.lineBudget)
    assert(line.contains("\"104\":1.23"))                 // sentinel survives
    assert(line.contains("\"700\":97"))                   // slowest kept
    assert((200 to 700).count(i => line.contains("\"" + i + "\":")) < 180)
    assert(line.contains("\"metric\":\"total\"") && line.contains("\"sf\":0.1"))
    // every slow query the budget can hold beats any fast one it kept
    val kept = (200 to 700).filter(i => line.contains("\"" + i + "\":"))
    val slowKept = kept.count(_ % 10 == 0)
    assert(slowKept == (200 to 700).count(_ % 10 == 0),
      "all slow-tail queries must survive before any fast one")
  }
}
