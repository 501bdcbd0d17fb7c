package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistance1Pairs finds substitution, insertion, deletion, and exact pairs — and nothing else") {
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"), // substitution
      (3L, "cat"), (4L, "cats"), // insertion at end
      (5L, "hello"), (6L, "hell"), // deletion at end
      (7L, "abc"), (8L, "bc"), // deletion at front
      (9L, "same"), (10L, "same"), // exact (dist 0)
      (11L, "unrelatedzzz")
    ).toDF("id", "s")
    val got = Dedup.editDistance1Pairs(rows, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (3L, 4L, 1), (5L, 6L, 1), (7L, 8L, 1),
      (9L, 10L, 0)))
  }

  test("editDistance1Pairs is COMPLETE vs brute force on real c_name data") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    val got = Dedup.editDistance1Pairs(c, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val names = c.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(want.nonEmpty) // the fixture actually exercises the operator
  }

  test("edJoinPairs (PassJoin) is COMPLETE vs brute force at dist<=2, incl. indel shifts") {
    val rows = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sittin"), // chain of dist-1s; 1~3 dist 2
      (4L, "abcdefgh"), (5L, "Xabcdefg"), // shift-by-insert-front (dist 2)
      (6L, "abcdefg"), // deletion of h (dist 1 to 4)
      (7L, "zzzzzzzz"),
      (8L, "same"), (9L, "same"), (10L, "sam"), (11L, "ame"),
      (12L, ""), (13L, "ab"), (14L, "x") // empty-string partners (dist 1, 2)
    ).toDF("id", "s")
    val got = Dedup.edJoinPairs(rows, "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val names = rows.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(want.exists(_._3 == 2)) // dist-2 pairs actually exercised
  }

  test("edJoinPairs matches brute force on real c_name data (dist<=2)") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    val got = Dedup.edJoinPairs(c, "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val names = c.as[(Long, String)].collect()
    val want = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("fuzzyPairs equals per-block brute force and respects the block boundary") {
    val rows = Seq(
      ("x", 1L, "alpha"), ("x", 2L, "alphaz"), ("x", 3L, "alzha"),
      ("y", 4L, "alpha"), // same text, different block: must NOT pair with 1
      ("y", 5L, "beta")
    ).toDF("blk", "id", "s")
    val got = Dedup.fuzzyPairs(rows, "id", "s", "blk", maxDist = 2)
      .select($"blk", $"id_a", $"id_b", $"dist")
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == Set(("x", 1L, 2L, 1), ("x", 1L, 3L, 1), ("x", 2L, 3L, 2)))
  }

  test("fuzzyPairs dist column equals true levenshtein (threshold form returns real distance)") {
    val rows = Seq(("b", 1L, "abcdef"), ("b", 2L, "abXdYf")).toDF("blk", "id", "s")
    val got = Dedup.fuzzyPairs(rows, "id", "s", "blk", maxDist = 2)
      .select($"dist").as[Int].collect().toSeq
    assert(got == Seq(2))
  }
}
