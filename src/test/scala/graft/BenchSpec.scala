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
}
