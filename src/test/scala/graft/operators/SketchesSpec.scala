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
}
