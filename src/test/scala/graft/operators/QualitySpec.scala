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

  test("tokenEntropy: exact micro units, 0 for uniform-repeat docs, ln(n) for all-distinct") {
    def qln(x: Long) = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val got = Quality.tokenEntropy(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"ent_micro")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: one token repeated 4x → H = 0 exactly
    assert(got(1L) == ((4L, 1L, 4L * qln(4) - 4L * qln(4))))
    assert(got(1L)._3 == 0L)
    // doc 3: 4 distinct singletons → n·qln(n) − 4·1·qln(1) = 4·qln(4)
    assert(got(3L) == ((4L, 4L, 4L * qln(4))))
    // doc 2: counts {2,1,1} → 4·qln(4) − 2·qln(2)
    assert(got(2L) == ((4L, 3L, 4L * qln(4) - 2L * qln(2))))
    // single-token doc: H = 0; empty doc absent
    assert(got(5L) == ((1L, 1L, 0L)))
    assert(!got.contains(4L))
    // repetitive doc must score strictly below the all-distinct doc
    assert(got(1L)._3 < got(3L)._3)
  }

  test("tfidfTopTerms ranks rare terms above common ones, exact micro math") {
    val out = Quality.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .select($"doc_id", $"term", $"tf", $"score_u")
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._4, r._2)).toList).toMap
    // N=4 scoring docs; idf_u = floor(ln(5/(df+1))*1e6+0.5) + 1e6
    def idfu(dfc: Long): Long =
      math.floor(math.log(5.0 / (dfc + 1.0)) * 1e6 + 0.5).toLong + 1000000L
    // doc 2: 'common' tf=2·idfu(df=3) = 2446288 beats rare1 1·idfu(1) =
    // 1916291 — tf dominates here; rare1 takes slot 2 on the term tie
    val d2 = out(2L)
    assert(d2.map(r => (r._2, r._4)) ==
      List(("common", 2 * idfu(3)), ("rare1", idfu(1))), s"doc2: $d2")
    // doc 1: only 'common' exists -> one row, score 4 * idf_u(df=3)
    assert(out(1L) == List((1L, "common", 4L, 4 * idfu(3))))
    // empty doc absent; every doc emits at most k rows
    assert(!out.contains(4L) && out.values.forall(_.size <= 2))
  }

  test("selectByTokenBudget keeps best bands first, id order inside a band") {
    // bands: {doc1(4 tok), doc5(1)} all-'common' (tied best avg_lp) >
    // doc2(4) mixed > doc3(4) all-singletons; doc4 empty -> never selected
    def sel(budget: Long): Set[Long] =
      Quality.selectByTokenBudget(docs, "doc_id", "text", budget)
        .select($"doc_id").as[Long].collect().toSet
    assert(sel(13) == Set(1L, 2L, 3L, 5L)) // whole corpus fits
    assert(sel(9) == Set(1L, 5L, 2L)) // best band + next
    assert(sel(5) == Set(1L, 5L)) // exactly the best band
    // budget 4: doc1 fills it; doc5 (same band, higher id) must drop
    assert(sel(4) == Set(1L))
    assert(sel(0) == Set.empty)
    // kept token mass never exceeds the budget
    val kept = Quality.selectByTokenBudget(docs, "doc_id", "text", 9)
      .agg(sum($"n_tokens")).as[Long].collect().head
    assert(kept <= 9)
  }

  test("selectByTokenBudget's PRE-checkpoint scoring plan passes the scale gate") {
    // the localCheckpoint inside selectByTokenBudget collapses the whole
    // scoring pipeline (two tokenization passes + vocab join) into a
    // LogicalRDD leaf — PlanGateSpec's q99 gate sees only the plan ABOVE
    // it. Gate the hidden plan here via the factored scoredBands.
    val scored = Quality.scoredBands(docs, "doc_id", "text", 1000)
    scored.count()
    // the vocab builder cross-joins ONE broadcast 1-row stats frame
    graft.plans.PlanWalk.assertShapes("scoredBands",
      scored.queryExecution.executedPlan, allowBroadcastNlj = true)
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

  test("bigramLogprob: hand-computed add-1 LM on a 2-doc corpus") {
    // corpus: "a b a b" + "a c" → bigrams: (a b)x2, (b a)x1, (a c)x1
    //   histories: a·=3, b·=1; vocab V={a,b,c}=3
    //   P(b|a)=(2+1)/(3+3)=1/2  P(a|b)=(1+1)/(1+3)=1/2  P(c|a)=(1+1)/(3+3)=1/3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Quality.bigramLogprob(docs, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"lp_micro").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val lpHalf = math.floor(math.log(0.5) * 1e6 + 0.5).toLong
    val lpThird = math.floor(math.log(1.0 / 3.0) * 1e6 + 0.5).toLong
    assert(out(1L) == ((3L, 3 * lpHalf)))  // a b, b a, a b — all ln(1/2)
    assert(out(2L) == ((1L, lpThird)))     // a c — ln(1/3)
  }

  test("bigramLogprob: single-token and empty docs are absent") {
    val docs = Seq((1L, "a b"), (2L, "solo"), (3L, "  ")).toDF("doc_id", "text")
    val ids = Quality.bigramLogprob(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("bigramLogprob ranks a coherent doc above a shuffled-word doc") {
    // 4 docs share phrase structure; doc 9 uses the same words in an
    // order the LM never saw elsewhere → lower conditional fluency
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat"),
      (9L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    val scored = Quality.bigramLogprob(docs, "doc_id", "text")
      .select($"doc_id", $"avg_lp").as[(Long, Double)].collect().toMap
    assert(scored(1L) > scored(9L))
    assert(scored(2L) > scored(9L))
  }

  test("momentSums produces exact integer second moments per group") {
    val df = Seq(("a", 1L, 2L), ("a", 3L, 4L), ("b", 5L, 6L))
      .toDF("k", "x", "y")
    val got = Quality.momentSums(df, "k", "x", "y")
      .select($"k", $"n", $"sx", $"sy", $"sxy", $"sxx", $"syy")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 4L, 6L, 14L, 10L, 20L)))
    assert(got("b") == (("b", 1L, 5L, 6L, 30L, 25L, 36L)))
    // corr finish on the six numbers (driver-side arithmetic): for group a,
    // corr of {(1,2),(3,4)} is exactly 1.
    val (_, n, sx, sy, sxy, sxx, syy) = got("a")
    val num = n * sxy - sx * sy
    val den = math.sqrt((n * sxx - sx * sx).toDouble) *
      math.sqrt((n * syy - sy * sy).toDouble)
    assert(math.abs(num / den - 1.0) < 1e-12)
  }

}
