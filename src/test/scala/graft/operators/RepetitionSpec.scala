package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("ngramStats: word-level counts, dup occurrences, modal gram") {
    // "a b a b a c": 6 words, 3 distinct; a×3 b×2 c×1
    //   dup_occ = (3-1)+(2-1) = 3; dup_chars = 3*1 + 2*1 = 5
    //   top word = "a" (cnt 3)
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = Repetition.ngramStats(df, "doc_id", "text", Seq(1)).collect()(0)
    assert(r.getAs[Long]("n1_total") == 6L)
    assert(r.getAs[Long]("n1_distinct") == 3L)
    assert(r.getAs[Long]("n1_dup_occ") == 3L)
    assert(r.getAs[Long]("n1_dup_chars") == 5L)
    assert(r.getAs[Long]("n1_top_cnt") == 3L)
    assert(r.getAs[String]("n1_top_gram") == "a")
    assert(r.getAs[Long]("n1_top_chars") == 3L)
  }

  test("ngramStats: bigram level and tie-break to lexicographically smallest") {
    // "x y x y z x y": bigrams = [x y, y x, x y, y z, z x, x y] →
    //   "x y"×3, "y x"×1, "y z"×1, "z x"×1: total 6, distinct 4,
    //   dup_occ 2, dup_chars 3*3=9, top ("x y", 3)
    val df = Seq((1L, "x y x y z x y")).toDF("doc_id", "text")
    val r = Repetition.ngramStats(df, "doc_id", "text", Seq(2)).collect()(0)
    assert(r.getAs[Long]("n2_total") == 6L)
    assert(r.getAs[Long]("n2_distinct") == 4L)
    assert(r.getAs[Long]("n2_dup_occ") == 2L)
    assert(r.getAs[Long]("n2_dup_chars") == 9L)
    assert(r.getAs[Long]("n2_top_cnt") == 3L)
    // tie case: "b a b a" → bigrams [b a, a b, b a]? no — [b a, a b, b a]
    // tie between nothing; use "c d c d" → [c d, d c, c d]: top "c d"×2.
    // Strict-> tie: "b b a a b b" 1-grams: a×2 b×4 → top b; tie check:
    val tie = Seq((1L, "b a b a")).toDF("doc_id", "text")
    val t = Repetition.ngramStats(tie, "doc_id", "text", Seq(1)).collect()(0)
    // a×2, b×2 — tie on count 2 → lexicographically smallest "a" wins
    assert(t.getAs[Long]("n1_top_cnt") == 2L)
    assert(t.getAs[String]("n1_top_gram") == "a")
  }

  test("ngramStats: short/empty docs degrade to zeros") {
    val df = Seq((1L, "only two"), (2L, "one")).toDF("doc_id", "text")
    val m = Repetition.ngramStats(df, "doc_id", "text", Seq(3))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n3_total")).toMap
    assert(m(1L) == 0L && m(2L) == 0L)
  }

  test("filterByRepetition drops degenerate repeats, keeps normal text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a quiet river"),
      (2L, "spam spam spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "text")
    val kept = Repetition.filterByRepetition(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("typed filterByRepetition decisions match the fold-derived thresholds") {
    // the typed predicate (RepetitionImpl.keep) must agree row for row
    // with the same thresholds computed from the oracle-gated column
    // fold's report on the fixture corpus — plus a null-text row, which
    // both forms drop
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .union(Seq((999999L, null: String)).toDF("doc_id", "text"))
    val typed = Repetition.filterByRepetition(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    val rep = Repetition.ngramStats(docs, "doc_id", "text", Seq(1, 2, 3))
      .join(docs.select($"doc_id", length($"text").cast("double").as("ch")),
        Seq("doc_id"))
    val fold = rep.filter(
        ($"n1_total" === 0 ||
          lit(1.0) - $"n1_distinct" / $"n1_total" <= 0.6) &&
        ($"ch" === 0 || $"n2_top_chars" / $"ch" <= 0.18) &&
        ($"ch" === 0 || $"n3_dup_chars" / $"ch" <= 0.4))
      .select($"doc_id").as[Long].collect().toSet
    assert(typed == fold)
    assert(!typed.contains(999999L))
  }

  test("lineStats counts duplicate lines and their characters") {
    // lines: nav×2 (3 chars each), body×1 → n=3, distinct=2,
    // dup_line_chars=6, total chars 3+3+9=15
    val df = Seq((1L, "nav\nbody body!\nnav")).toDF("doc_id", "text")
    val r = Repetition.lineStats(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("n_distinct_lines") == 2L)
    assert(r.getAs[Long]("dup_line_chars") == 6L)
    assert(r.getAs[Long]("total_line_chars") == 16L)
  }

  test("dedupLinesWithinDoc keeps first occurrence, preserves order") {
    val df = Seq(
      (1L, "a\nb\na\nc\nb\na"),
      (2L, "x\ny"),
      (3L, "z\nz\nz")
    ).toDF("doc_id", "text")
    val out = Repetition.dedupLinesWithinDoc(df, "doc_id", "text")
      .select($"doc_id", $"text", $"n_lines", $"n_kept")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ("a\nb\nc", 6L, 3L))
    assert(out(2L) == ("x\ny", 2L, 2L))
    assert(out(3L) == ("z", 3L, 1L))
  }

  test("ngramStats plan is shuffle-free (map-only projection)") {
    val df = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val plan = Repetition.ngramStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val plan2 = Repetition.dedupLinesWithinDoc(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Exchange"), s"unexpected shuffle:\n$plan2")
  }
}
