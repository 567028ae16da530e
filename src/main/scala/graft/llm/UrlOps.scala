package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus pipelines — the dedup/filter keys a
  * crawler-fed training pipeline needs BEFORE any text-level dedup:
  * canonical URL (so `?utm_source=` twins collapse), registrable
  * domain (the per-site aggregation/blocklist key), and a broadcast
  * blocklist anti-join.
  *
  * Scope (documented, deterministic, DuckDB-mirrorable — every regex
  * is in the Java∩RE2 common subset):
  *  - scheme and host lowercase; path/query case preserved
  *  - fragment dropped
  *  - tracking params removed: any `utm_*`, plus gclid/dclid/fbclid/
  *    msclkid (param ORDER otherwise preserved — no sort, so the
  *    canonical form is stable but not order-insensitive)
  *  - default ports dropped (http:80, https:443); others kept
  *  - ONE trailing slash stripped from the path (`/a/b/` → `/a/b`,
  *    bare `/` → empty)
  *  - no userinfo/IPv6 handling (not in crawl-frontier URLs we model;
  *    they pass through the host regex untouched)
  *
  * Registrable domain: last two labels, or last three when the last
  * two are a listed two-level public suffix (embedded subset of the
  * public-suffix list — the full list is a data file in production;
  * the ALGORITHM is what's under test). All-numeric hosts (IPv4) are
  * their own domain.
  *
  * All per-row projections — no shuffle anywhere; the blocklist join
  * broadcasts (asserted in UrlOpsSpec).
  */
object UrlOps {

  /** Two-level public suffixes (embedded subset, alphabetical). */
  val twoLevelSuffixes: Seq[String] = Seq(
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.hk", "com.mx", "com.sg",
    "com.tr", "gov.uk", "ne.jp", "net.au", "or.jp", "org.au", "org.uk")

  val trackingParams: Seq[String] = Seq("gclid", "dclid", "fbclid", "msclkid")

  // -- dissection (regexp_extract returns '' on no-match, both hosts) --
  private def preFragment(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)", 1)
  private def authority(rest: Column): Column =
    regexp_extract(rest, "^([^/?]*)", 1)

  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
  def host(url: Column): Column =
    lower(regexp_extract(authority(preFragment(url)), "^([^:]*)", 1))
  def port(url: Column): Column =
    regexp_extract(authority(preFragment(url)), ":([0-9]+)$", 1)
  def path(url: Column): Column = {
    val rest = preFragment(url)
    regexp_extract(substr(rest, length(authority(rest)) + 1), "^([^?]*)", 1)
  }
  def query(url: Column): Column = {
    val rest = preFragment(url)
    regexp_extract(substr(rest, length(authority(rest)) + 1), "\\?(.*)$", 1)
  }

  /** Query string with tracking params removed, order preserved. */
  def cleanQuery(url: Column): Column = {
    val keptParams = filter(split(query(url), "&"), p =>
      !(startswith(p, lit("utm_")) ||
        get(split(p, "="), lit(0)).isInCollection(trackingParams)))
    array_join(keptParams, "&")
  }

  /** Canonical URL per the rules above. */
  def normalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val prt = port(url)
    val keepPort = prt =!= "" &&
      !((sch === "http" && prt === "80") || (sch === "https" && prt === "443"))
    val cleanPath = regexp_replace(path(url), "/$", "")
    val q = cleanQuery(url)
    concat(
      sch, lit("://"), host(url),
      when(keepPort, concat(lit(":"), prt)).otherwise(""),
      cleanPath,
      when(q =!= "", concat(lit("?"), q)).otherwise(""))
  }

  /** Registrable domain of an already-lowercased host. */
  def registrableDomain(h: Column): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(h.rlike("^[0-9.]+$") || n <= 2, h)
      .when(last2.isInCollection(twoLevelSuffixes) && n >= 3, last3)
      .otherwise(last2)
  }

  /** Deterministic synthetic URL per document — eight shapes cycling
    * on `doc_id % 8`, exercising every rule: mixed-case scheme/host,
    * default and non-default ports, tracking params at head/mid/tail,
    * fragments, trailing slashes, a two-level-suffix host, an IPv4
    * host, and two blocklisted domains (m=2 spam.example, m=4
    * ads.co.uk). Mirrored verbatim in the q87 oracle. */
  def syntheticUrl(docId: Column): Column = {
    val id = docId.cast("string")
    val m = pmod(docId, lit(8))
    when(m === 0, concat(lit("https://WWW.Example.COM:443/path/page?utm_source=x&id="), id, lit("#frag")))
      .when(m === 1, concat(lit("http://Blog.example.co.uk:80/a/b/?gclid=123&q=term"), id))
      .when(m === 2, concat(lit("https://spam.example/buy"), id, lit("?fbclid=abc")))
      .when(m === 3, concat(lit("http://192.168.10."), pmod(docId, lit(256)).cast("string"), lit("/index.html")))
      .when(m === 4, concat(lit("https://sub.ads.co.uk/x?a="), id, lit("&b=2#sec")))
      .when(m === 5, concat(lit("HTTPS://News.Site.ORG/Article/"), id, lit("/")))
      .when(m === 6, concat(lit("http://example.com.au/?utm_campaign=c&utm_term="), id))
      .otherwise(concat(lit("https://a.b.example.com:8443/deep/path?z="), id, lit("&gclid=g")))
  }

  /** Drop rows whose registrable domain is blocklisted — broadcast
    * anti-join (the blocklist is a small dimension by construction). */
  def filterBlocked(df: DataFrame, domain: Column, blocked: DataFrame): DataFrame =
    df.join(broadcast(blocked.select(col(blocked.columns.head).as("_graft_blocked"))),
      domain === col("_graft_blocked"), "left_anti")
}
