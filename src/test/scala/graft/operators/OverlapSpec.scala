package graft.operators

import graft.SparkSpec

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  // 3-gram shingle sets: A = {a b c, b c d}, B = {a b c, b c e},
  // C = {x y z} -> J(A,B) = 1/3, J(A,C) = J(B,C) = 0
  private val docs = Seq(
    ("A", "a b c d"),
    ("B", "a b c e"),
    ("C", "x y z")
  ).toDF("source", "text")

  test("overlapExact computes the hand-checked pairwise jaccard matrix") {
    val out = Overlap.overlapExact(docs, "source", "text", n = 3)
      .select($"src_a", $"src_b", $"inter", $"union_sz", $"jaccard_r")
      .as[(String, String, Long, Long, Double)].collect().toSet
    // zero-intersection pairs are absent by construction (inner join)
    assert(out == Set(("A", "B", 1L, 3L, 0.333333)))
  }

  test("overlapExact is symmetric-by-ordering and scales union counts over many docs") {
    val multi = Seq(
      ("A", "a b c d"), ("A", "p q r"), // A = {a b c, b c d, p q r}
      ("B", "b c d e"), ("B", "p q r") // B = {b c d, c d e, p q r}
    ).toDF("source", "text")
    val out = Overlap.overlapExact(multi, "source", "text", n = 3)
      .as[(String, String, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (a, b, inter, union, j) = out.head
    assert(a == "A" && b == "B" && inter == 2 && union == 4 && j == 0.5)
  }

  test("overlapMinhash estimate tracks the exact jaccard on a seeded corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    def doc(words: Seq[String]) = words.mkString(" ")
    // S1/S2 share half their docs' content; S3 is disjoint
    val shared = Seq.fill(30)(doc(Seq.fill(12)(vocab(rnd.nextInt(20)))))
    val s1Only = Seq.fill(30)(doc(Seq.fill(12)(vocab(rnd.nextInt(20)))))
    val s2Only = Seq.fill(30)(doc(Seq.fill(12)(vocab(rnd.nextInt(20)))))
    val s3 = Seq.fill(30)(doc(Seq.fill(12)("z" + rnd.nextInt(20))))
    val df = ((shared ++ s1Only).map(("S1", _)) ++
      (shared ++ s2Only).map(("S2", _)) ++
      s3.map(("S3", _))).toDF("source", "text")
    val exact = Overlap.overlapExact(df, "source", "text", n = 3)
      .select($"src_a", $"src_b", $"jaccard_r")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = Overlap.overlapMinhash(df, "source", "text", n = 3, k = 128)
      .select($"src_a", $"src_b", $"jaccard_est")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // stderr ~ sqrt(j(1-j)/128) <= 0.045 — allow 3 sigma
    val j12 = exact(("S1", "S2"))
    assert(j12 > 0.2, s"seeded overlap unexpectedly low: $j12")
    assert(math.abs(est(("S1", "S2")) - j12) < 0.14,
      s"estimate ${est(("S1", "S2"))} too far from exact $j12")
    // disjoint pairs: sketch emits them with a (near-)zero estimate
    assert(est(("S1", "S3")) < 0.1 && est(("S2", "S3")) < 0.1)
    assert(!exact.contains(("S1", "S3")))
  }
}
