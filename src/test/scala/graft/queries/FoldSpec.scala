package graft.queries

import graft.SparkSpec
import graft.functions.FoldAggregator
import org.apache.spark.sql.functions._

/** Fold-with-initial-value semantics (reference FoldDemo golden: per-key
  * running fold, deprecated in Flink — first-class Aggregator here).
  */
class FoldSpec extends SparkSpec {
  import spark.implicits._

  test("typed fold aggregator: sum fold equals groupBy sum") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 5L), ("a", 4L)).toDF("k", "v")
    val fold = udaf(FoldAggregator.sumFold)
    val got = df.groupBy($"k").agg(fold($"v").as("folded"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 7L), ("b", 5L)))
  }

  test("custom-zero fold: max with floor initial value") {
    val agg = new FoldAggregator[Long, Long](10L, math.max, math.max)(
      org.apache.spark.sql.Encoders.scalaLong)
    val fold = udaf(agg)
    val df = Seq(("a", 3L), ("a", 15L), ("b", 2L)).toDF("k", "v")
    val got = df.groupBy($"k").agg(fold($"v").as("m"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 15L), ("b", 10L))) // zero=10 floors b's max
  }
}
