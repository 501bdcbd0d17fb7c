package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize($"url").as("c"))
      .as[String].collect().toSeq

  test("canonicalize: case, www, default port, fragment, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/B/#frag") ==
      Seq("https://example.com/A/B"))
    assert(canon("http://www.Example.com:80/") == Seq("http://example.com/"))
    // non-default port survives; path case preserved
    assert(canon("https://Example.com:8443/Path") ==
      Seq("https://example.com:8443/Path"))
    // empty path -> root
    assert(canon("https://example.com") == Seq("https://example.com/"))
  }

  test("canonicalize: tracking params dropped, others kept in order") {
    assert(canon("https://e.com/p?utm_source=x&id=1&utm_campaign=y&b=2") ==
      Seq("https://e.com/p?id=1&b=2"))
    assert(canon("https://e.com/p?gclid=abc&fbclid=def") ==
      Seq("https://e.com/p"))
    // a param merely containing 'utm_' mid-name is NOT tracking
    assert(canon("https://e.com/p?xutm_source=1") ==
      Seq("https://e.com/p?xutm_source=1"))
  }

  test("unparseable URLs pass through unchanged — no canonical collapse") {
    // relative links / garbage must each stay their own dedup key: a
    // shared sentinel canonical would make keep-first delete all but one
    assert(canon("foo.html", "bar/baz.html", "not a url") ==
      Seq("foo.html", "bar/baz.html", "not a url"))
    val docs = Seq((1L, 10L, "relative/a.html"), (2L, 20L, "relative/b.html"))
      .toDF("doc_id", "n_chars", "url")
    val out = Urls.dedupAndCapPerDomain(docs, "url", "doc_id", "n_chars",
      cap = 5).select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L), "distinct malformed URLs must both survive")
  }

  test("canonicalize is idempotent: the canonical form is its own fixed point") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/A/B/#frag",
      "http://www.Example.com:80/",
      "https://Example.com:8443/Path?utm_source=x&id=1",
      "https://example.com",
      "https://e.com/p?gclid=a&b=2&fbclid=c",
      "https://sub.domain.e.com/Deep/Path/?q=1&utm_campaign=z#x")
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(twice == once)
  }

  test("dedupAndCapPerDomain: keep-first per canonical URL, cap per host") {
    val docs = Seq(
      // three spellings of the same page on a.com -> doc 1 survives
      (1L, 100L, "https://WWW.A.com/x?utm_source=s"),
      (2L, 999L, "https://a.com/x"),
      (3L, 500L, "https://a.com:443/x/"),
      // distinct pages on a.com, weights force cap ordering
      (4L, 300L, "https://a.com/y"),
      (5L, 200L, "https://a.com/z"),
      (6L, 400L, "https://b.com/q")
    ).toDF("doc_id", "n_chars", "url")
    val out = Urls.dedupAndCapPerDomain(docs, "url", "doc_id", "n_chars", cap = 2)
      .select($"host", $"doc_id", $"rk").as[(String, Long, Int)]
      .collect().toSet
    // a.com canonical /x kept doc 1 (first), weight 100 -> beaten by y(300)
    // and z(200) under cap=2; b.com keeps its only doc
    assert(out == Set(("a.com", 4L, 1), ("a.com", 5L, 2), ("b.com", 6L, 1)))
  }

  test("dedupAndCapPerDomain exempts hostless rows from the per-host cap") {
    val docs = Seq(
      // three DISTINCT unparseable URLs — all must survive a cap of 1
      (1L, 10L, "not a url at all"),
      (2L, 20L, "/relative/link/one"),
      (3L, 30L, "/relative/link/two"),
      // a real host to prove the cap still bites
      (4L, 40L, "https://a.com/x"),
      (5L, 50L, "https://a.com/y")
    ).toDF("doc_id", "n_chars", "url")
    val out = Urls.dedupAndCapPerDomain(docs, "url", "doc_id", "n_chars", cap = 1)
      .select($"doc_id", $"host", $"rk").as[(Long, String, Int)]
      .collect().toSet
    // hostless rows all keep rk=1; a.com capped to its heaviest doc
    assert(out == Set((1L, "", 1), (2L, "", 1), (3L, "", 1), (5L, "a.com", 1)))
  }

  test("dedupStream: keep-first per canonical URL; expired entries re-admit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val out = Urls.dedupStream(
      ms.toDF().toDF("id", "ts", "url"), "url", "ts", "10 seconds")
    val q = out.writeStream.format("memory").queryName("url_dedup_out")
      .outputMode("append").start()
    try {
      // three spellings of one page in one horizon -> only the first lands
      ms.addData((1L, t(10), "https://WWW.A.com/x?utm_source=s"),
        (2L, t(11), "https://a.com/x"), (3L, t(12), "https://a.com:443/x/"))
      q.processAllAvailable()
      val ids1 = spark.table("url_dedup_out").select($"id").as[Long]
        .collect().toSet
      assert(ids1 == Set(1L))
      // push the watermark far past the horizon: the canonical entry is
      // GC'd and the same page is admitted again (horizon-bounded trade)
      ms.addData((9L, t(200), "https://other.com/fresh"))
      q.processAllAvailable()
      ms.addData((4L, t(210), "https://www.a.com/x"))
      q.processAllAvailable()
      val ids2 = spark.table("url_dedup_out").select($"id").as[Long]
        .collect().toSet
      assert(ids2 == Set(1L, 9L, 4L))
    } finally q.stop()
  }

  test("dedupAndCapPerDomain keeps the first row even when later dups weigh more") {
    val docs = Seq(
      (7L, 10L, "https://c.com/only"),
      (8L, 9999L, "https://www.c.com/only/")
    ).toDF("doc_id", "n_chars", "url")
    val out = Urls.dedupAndCapPerDomain(docs, "url", "doc_id", "n_chars", cap = 5)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSeq
    assert(out == Seq((7L, 10L)))
  }
}
