package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "common common common common"), // all high-frequency tokens
    (2L, "common common rare1 rare2"), // mixed
    (3L, "rare3 rare4 rare5 rare6"), // all singletons
    (4L, "   "), // empty after trim -> absent from scores
    (5L, "common")
  ).toDF("doc_id", "text")

  test("unigramLogprob scores frequent-token docs higher and drops empty docs") {
    val s = Quality.unigramLogprob(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"avg_lp")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap
    assert(s.keySet == Set(1L, 2L, 3L, 5L))
    assert(s(1L)._1 == 4 && s(3L)._1 == 4)
    // common appears 7 times of 13 tokens; singletons once: ordering holds
    assert(s(1L)._2 > s(2L)._2 && s(2L)._2 > s(3L)._2)
    // a doc of only 'common' tokens scores exactly ln(7/13) per token
    val want = math.floor(math.log(7.0 / 13.0) * 1e6 + 0.5) / 1e6
    assert(math.abs(s(1L)._2 - want) < 1e-9)
  }

  test("filterByLogprobBand trims both tails by the supplied cutoffs") {
    val scored = Quality.unigramLogprob(docs, "doc_id", "text")
      .select($"doc_id", $"avg_lp").as[(Long, Double)].collect().toMap
    val lo = scored(3L) + 1e-9 // exclude the all-singleton doc
    val hi = scored(1L) - 1e-9 // exclude the all-common doc
    val kept = Quality.filterByLogprobBand(docs, "doc_id", "text", lo, hi)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }
}
