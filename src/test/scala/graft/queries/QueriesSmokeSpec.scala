package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every declared gate query runs end-to-end at sf0.001 and each
  * oracle-covered query key exists (driver-contract invariants).
  */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // materialize
    }
  }
}
