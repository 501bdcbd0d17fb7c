package graft.operators

import graft.SparkSpec

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.select($"center", $"context", $"n_pairs", $"w_micro")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, n, w) => (a, b) -> ((n, w)) }.toMap

  test("skipgramPairs counts symmetric windows with harmonic micro weights") {
    // "a b a": pairs (i, i+d): (a,b,1) (a,a,2) (b,a,1) — each emitted
    // both ways. w(1) = 1000000, w(2) = 500000.
    val got = table(Cooccurrence.skipgramPairs(
      Seq("a b a").toDF("text"), "text", window = 4))
    assert(got == Map(
      ("a", "b") -> ((2L, 2000000L)),
      ("b", "a") -> ((2L, 2000000L)),
      ("a", "a") -> ((2L, 1000000L))))
  }

  test("window bounds the offset; minCount prunes the tail without changing survivors") {
    // "x y z w": window=1 keeps only adjacent pairs
    val w1 = table(Cooccurrence.skipgramPairs(
      Seq("x y z w").toDF("text"), "text", window = 1))
    assert(w1.keySet == Set(("x", "y"), ("y", "x"), ("y", "z"),
      ("z", "y"), ("z", "w"), ("w", "z")))
    assert(w1.values.forall(_ == ((1L, 1000000L))))
    // two docs: ("p q" twice) + ("p q" once more) → (p,q) count 3
    val docs = Seq("p q p q", "p q").toDF("text")
    val all = table(Cooccurrence.skipgramPairs(docs, "text", window = 3))
    val kept = table(Cooccurrence.skipgramPairs(docs, "text", window = 3,
      minCount = 3L))
    assert(kept.keySet.forall(k => all(k) == kept(k)),
      "minCount changed a surviving row's values")
    assert(kept.keySet == all.filter(_._2._1 >= 3L).keySet)
    // "p q p q" → (p,q) from forward pairs (0,1) (2,3) at d=1 and
    // (0,3) at d=3, PLUS the reverse emission of the (q,p) pair (1,2)
    // at d=1; "p q" adds one more at d=1 → n=5
    assert(all(("p", "q"))._1 == 5L)
    assert(all(("p", "q"))._2 == 4000000L + 1000000L / 3)
  }

  test("pmiPairs quantizes each ln before the integer combine") {
    // "a b": matrix {(a,b):1, (b,a):1}; T=2, n_a=n_b=1 →
    // pmi = qln(1) + qln(2) − qln(1) − qln(1) = floor(ln 2 ·1e6 + .5)
    val got = Cooccurrence.pmiPairs(Seq("a b").toDF("text"), "text",
        window = 2)
      .select($"center", $"context", $"n_pairs", $"pmi_micro")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, n, p) => (a, b) -> ((n, p)) }.toMap
    val qln2 = math.floor(math.log(2.0) * 1e6 + 0.5).toLong
    assert(got == Map(("a", "b") -> ((1L, qln2)),
      ("b", "a") -> ((1L, qln2))))
    // marginals come from the PRUNED matrix: with minCount=2 on
    // "c d c d c" the (c,c) pair (d=2, twice... ) — just assert no row
    // falls below minCount and PMI stays finite on every survivor
    val pruned = Cooccurrence.pmiPairs(
        Seq("c d c d c", "c d").toDF("text"), "text",
        window = 2, minCount = 2L)
      .select($"n_pairs").as[Long].collect()
    assert(pruned.nonEmpty && pruned.forall(_ >= 2L))
  }

  test("negativeSamplingTable: f^(3/4) micro weights, exclusive ranges, vocab cap") {
    // "a a a a b": f(a)=4 → w = floor(4^0.75·1e6) = floor(2^1.5·1e6);
    // f(b)=1 → w = 1e6. Ranges: a starts at 0, b at w(a).
    val got = Cooccurrence.negativeSamplingTable(
        Seq("a a a a b").toDF("text"), "text")
      .select($"tok", $"f", $"w_micro", $"cum_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val wa = math.floor(math.sqrt(math.sqrt(64.0)) * 1e6).toLong
    assert(got == Map("a" -> ((4L, wa, 0L)), "b" -> ((1L, 1000000L, wa))))
    assert(wa == 2828427L)
    // cap keeps the top-V by (f desc, tok)
    val capped = Cooccurrence.negativeSamplingTable(
        Seq("x x y z").toDF("text"), "text", maxVocab = 2)
      .select($"tok").as[String].collect().toSet
    assert(capped == Set("x", "y"))
  }

  test("whitespace-edge docs follow the house tokenization (space-trim, \\s+ split)") {
    // space-only doc contributes nothing; a tab-separated doc tokenizes
    // on the tab; leading/trailing spaces are trimmed before the split
    val got = table(Cooccurrence.skipgramPairs(
      Seq("   ", "m\tn", " r s ").toDF("text"), "text", window = 2))
    assert(got.keySet == Set(("m", "n"), ("n", "m"), ("r", "s"), ("s", "r")))
    // null text must not blow up
    val withNull = Seq((1L, "a b"), (2L, null))
      .toDF("doc_id", "text")
    assert(table(Cooccurrence.skipgramPairs(withNull, "text", window = 2))
      .keySet == Set(("a", "b"), ("b", "a")))
  }
}
