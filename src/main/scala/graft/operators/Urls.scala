package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + per-domain curation — the CommonCrawl-style
  * front door of a web-corpus pipeline: the same page arrives under
  * many spellings (case-shifted scheme/host, `www.` prefix, default
  * port, tracking params, fragments, trailing slashes), and without a
  * canonical form, URL-level dedup undercounts and per-domain caps
  * leak. Everything here is codegen'd builtin expressions
  * (regexp_extract/replace, array ops) — no UDF in the hot path — and
  * each step is mirrored 1:1 by the DuckDB oracle SQL (q121).
  *
  * Canonical form: lowercase scheme and host, `www.` stripped, default
  * port stripped (`:443` for https, `:80` for http), fragment dropped,
  * tracking params (`utm_*`, `gclid`, `fbclid`, `msclkid`, `mc_eid`)
  * removed with remaining param order preserved, trailing slashes
  * collapsed (root stays `/`). Path case is preserved — paths are
  * case-sensitive on real servers.
  */
object Urls {

  /** Params dropped by [[canonicalize]] (anchored full-param match). */
  val trackingParamRe = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=.*)?$"

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val restRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  /** Canonical form of an absolute URL column. A value that does not
    * parse as an absolute URL (no `scheme://` prefix — relative links,
    * garbage rows) passes through UNCHANGED: collapsing every
    * unparseable value onto one canonical string would make the
    * downstream keep-first dedup silently delete all but one of them.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val hostport = regexp_replace(lower(regexp_extract(url, hostRe, 1)),
      "^www\\.", "")
    val hostc = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val rest = regexp_extract(url, restRe, 1) // fragment already excluded
    val path0 = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val pathc = when(path0 === "", lit("/")).otherwise(path0)
    val rawQ = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(filter(split(rawQ, "&"),
      p => !p.rlike(trackingParamRe) && p =!= lit("")), "&")
    when(url.rlike(schemeRe),
      concat(scheme, lit("://"), hostc, pathc,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
      .otherwise(url)
  }

  /** Host (registrable domain incl. subdomains) of a canonical URL. */
  def host(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** Canonical-URL keep-first dedup, then a per-host document cap:
    * canonicalize `urlCol`, keep the lowest-`idCol` row per canonical
    * URL, then keep the top `cap` rows per host by (`weightCol` desc,
    * `idCol`) — the standard domain-balance guard against a single
    * host flooding the corpus. Adds `canon`, `host`, `rk` (per-host
    * rank).
    *
    * Scale shape: two key-partitioned window shuffles (canonical URL,
    * then host) — rank never sorts globally. A pathologically hot host
    * partition (a mega-domain) is the [[graft]] top-k skew case; route
    * the cap through the native TopKPerGroup operator if one host's
    * row count dwarfs a partition.
    *
    * Rows whose URL has no parseable host (`host` = "" — relative
    * links, garbage) are EXEMPT from the cap (`rk` = 1): they are not a
    * domain, so capping them as one would both recreate the collapse
    * [[canonicalize]]'s pass-through avoids and pile every malformed
    * row into a single skewed window partition — each gets its own
    * partition key instead.
    */
  def dedupAndCapPerDomain(docs: DataFrame, urlCol: String, idCol: String,
      weightCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val canon = docs
      .withColumn("canon", canonicalize(col(urlCol)))
      .withColumn("host", host(col("canon")))
    val first = canon
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("canon")).orderBy(col(idCol))))
      .filter(col("_rn") === 1).drop("_rn")
    // hostless rows rank alone (per-row subkey); real hosts share "" and
    // rank within the host as before
    val capSubKey = when(col("host") === "", col(idCol).cast("string"))
      .otherwise(lit(""))
    first
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("host"), capSubKey)
          .orderBy(col(weightCol).desc, col(idCol))))
      .filter(col("rk") <= cap)
  }

  /** Streaming keep-first dedup per canonical URL — the unbounded form
    * of the [[dedupAndCapPerDomain]] keep-first stage: canonicalize,
    * then `dropDuplicatesWithinWatermark` on the canonical form. State
    * holds one entry per distinct canonical URL inside the watermark
    * horizon (bounded by arrival rate × `wmDelay`, not stream length);
    * a spelling that re-arrives after its canonical entry expires is
    * admitted again — the standard horizon-bounded trade
    * ([[graft.streaming.StreamDedup]] discipline). The watermark is
    * applied inside (a caller-side one would sit below the projection).
    */
  def dedupStream(docs: DataFrame, urlCol: String, tsCol: String,
      wmDelay: String): DataFrame =
    docs.withColumn("canon", canonicalize(col(urlCol)))
      .withWatermark(tsCol, wmDelay)
      .dropDuplicatesWithinWatermark("canon")
}
