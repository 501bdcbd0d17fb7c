package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "ACCEPT COOKIES TO CONTINUE"
  private val footer = "(c) 2026 example.com all rights reserved"

  private def lineCorpus = Seq(
    (1L, s"$banner\nunique alpha content one\n$footer"),
    (2L, s"$banner\nunique beta content two\nmore beta\n$footer"),
    (3L, s"unique gamma content three\n$footer"),
    (4L, s"$banner\n$footer"), // all boilerplate
    (5L, "entirely unique document five")
  ).toDF("doc_id", "text")

  test("stripFrequentLines drops recurring lines, preserves order, counts drops") {
    val out = Boilerplate.stripFrequentLines(lineCorpus, "doc_id", "text",
        minDocs = 2)
      .select($"doc_id", $"text", $"n_segments", $"n_dropped")
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(out(1L) == ("unique alpha content one", 3L, 2L))
    assert(out(2L) == ("unique beta content two\nmore beta", 4L, 2L))
    assert(out(3L) == ("unique gamma content three", 2L, 1L))
    // a doc that is ALL boilerplate survives with empty text
    assert(out(4L) == ("", 2L, 2L))
    assert(out(5L) == ("entirely unique document five", 1L, 0L))
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("blank segments are structural, never counted frequent") {
    val docs = Seq(
      (1L, "alpha\n\nbeta"),
      (2L, "gamma\n\ndelta"),
      (3L, "epsilon\n\nzeta")
    ).toDF("doc_id", "text")
    val byId = Boilerplate.stripFrequentLines(docs, "doc_id", "text", minDocs = 2)
      .select($"doc_id", $"text", $"n_dropped").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the empty middle line appears in all 3 docs but must NOT be dropped
    assert(byId(1L) == (("alpha\n\nbeta", 0L)))
    assert(byId(2L) == (("gamma\n\ndelta", 0L)))
  }

  test("window form: nothing frequent → text reassembles exactly") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    // minDocs above corpus size → no segment can be frequent
    val out = Boilerplate.stripFrequentWindows(docs, "doc_id", "text",
      winTokens = 8, minDocs = 1000)
    assert(out.count() == 50)
    assert(out.filter($"n_dropped" =!= 0).count() == 0)
    // reassembly is token-exact: stripped text == original tokens joined
    val orig = docs.select($"doc_id",
      regexp_replace(trim($"text"), "\\s+", " ").as("norm"))
    val mismatches = out.join(orig, "doc_id")
      .filter($"text" =!= $"norm").count()
    assert(mismatches == 0, "window reassembly must be token-exact")
  }

  test("window form drops shared windows between exact-duplicate docs") {
    val docs = Seq(
      (1L, "one two three four five six seven eight tail-a unique-a"),
      (2L, "one two three four five six seven eight tail-b unique-b"),
      (3L, "totally different content here with no overlap at all pad")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripFrequentWindows(docs, "doc_id", "text",
        winTokens = 8, minDocs = 2)
      .select($"doc_id", $"text", $"n_dropped")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // docs 1/2 share their first aligned 8-token window; tails differ
    assert(out(1L) == (("tail-a unique-a", 1L)))
    assert(out(2L) == (("tail-b unique-b", 1L)))
    assert(out(3L)._2 == 0L)
  }

  test("frequentSegments counts DISTINCT docs, not occurrences") {
    val docs = Seq(
      (1L, "dup\ndup\ndup"), // 3 occurrences, 1 doc
      (2L, "other\nlines\nhere")
    ).toDF("doc_id", "text")
    val freq = Boilerplate.frequentSegments(
      Boilerplate.segmentsByDelim(docs, "doc_id", "text"), "doc_id", minDocs = 2)
    assert(freq.count() == 0, "within-doc repeats must not count as frequent")
  }

  test("dedupLinesKeepFirst keeps only the globally first (doc_id, pos) copy") {
    val docs = Seq(
      (1L, "shared line\nalpha only"),
      (2L, "beta only\nshared line\nbeta tail"),
      (3L, "shared line") // loses its only line entirely
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupLinesKeepFirst(docs, "doc_id", "text")
      .select($"doc_id", $"text", $"n_segments", $"n_dropped")
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(out(1L) == (("shared line\nalpha only", 2L, 0L)))
    assert(out(2L) == (("beta only\nbeta tail", 3L, 1L)))
    assert(out(3L) == (("", 1L, 1L)))
  }

  test("dedupLinesKeepFirst: within-doc repeats collapse to the first; blanks exempt") {
    val docs = Seq(
      (1L, "dup\n\ndup\nend"), // blank between repeats survives
      (2L, "\n\n")             // all-blank doc unchanged
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupLinesKeepFirst(docs, "doc_id", "text")
      .select($"doc_id", $"text", $"n_segments", $"n_dropped")
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(out(1L) == (("dup\n\nend", 4L, 1L)))
    assert(out(2L) == (("\n\n", 3L, 0L)))
  }
}
