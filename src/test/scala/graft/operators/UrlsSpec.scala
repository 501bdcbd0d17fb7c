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
