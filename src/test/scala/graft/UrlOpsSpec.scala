package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.llm.UrlOps

class UrlOpsSpec extends SparkTestBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(Tuple1(u)).toDF("u").select(UrlOps.normalizeUrl(col("u"))).as[String].head()
  private def dom(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(UrlOps.registrableDomain(UrlOps.host(col("u")))).as[String].head()

  test("normalizeUrl decision table") {
    val cases = Seq(
      // scheme+host lower, default port dropped, utm stripped, fragment dropped
      "https://WWW.Example.COM:443/path/page?utm_source=x&id=7#frag" ->
        "https://www.example.com/path/page?id=7",
      // http:80 dropped; trailing slash stripped; gclid stripped mid-list
      "http://Blog.example.co.uk:80/a/b/?gclid=123&q=t" ->
        "http://blog.example.co.uk/a/b?q=t",
      // all params tracking → no '?', root slash stripped
      "http://example.com.au/?utm_campaign=c&utm_term=t" -> "http://example.com.au",
      // non-default port kept; param order preserved
      "https://h.example.com:8443/p?z=9&a=1&gclid=g" ->
        "https://h.example.com:8443/p?z=9&a=1",
      // path/query case preserved, only scheme/host lowered
      "HTTPS://News.Site.ORG/Article/Q?X=Y" -> "https://news.site.org/Article/Q?X=Y",
      // bare host, no path
      "http://example.com" -> "http://example.com",
      // param without '=' survives (not a tracking name)
      "http://e.com/p?flag&utm_x=1" -> "http://e.com/p?flag",
      // utm prefix match is on the raw param, not the name list
      "http://e.com/p?myutm_source=1" -> "http://e.com/p?myutm_source=1")
    for ((in, want) <- cases) assert(norm(in) == want, s"input: $in")
  }

  test("registrableDomain decision table") {
    val cases = Seq(
      "https://www.example.com/x" -> "example.com",
      "https://a.b.example.com/x" -> "example.com",
      "http://blog.example.co.uk/" -> "example.co.uk",
      "http://sub.ads.co.uk/" -> "ads.co.uk",
      "http://example.com.au/" -> "example.com.au", // exactly suffix+1 label
      "http://co.uk/" -> "co.uk",                   // bare two-label host
      "http://localhost/" -> "localhost",
      "http://192.168.10.7/x" -> "192.168.10.7")    // IPv4 = its own domain
    for ((in, want) <- cases) assert(dom(in) == want, s"input: $in")
  }

  test("blocklist anti-join drops listed domains and broadcasts") {
    val docs = spark.range(16).select(col("id").as("doc_id"),
      UrlOps.syntheticUrl(col("id")).as("url"))
    val withDomain = docs.select(col("doc_id"),
      UrlOps.registrableDomain(UrlOps.host(col("url"))).as("domain"))
    val kept = UrlOps.filterBlocked(withDomain, col("domain"),
      Seq("spam.example", "ads.co.uk").toDF("domain"))
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds == (0L until 16L).filter(i => i % 8 != 2 && i % 8 != 4).toSet)
    val plan = kept.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"expected broadcast anti-join:\n$plan")
  }

  test("the eight q87 templates land on the expected domains") {
    val d = spark.range(8).select(
      UrlOps.registrableDomain(UrlOps.host(UrlOps.syntheticUrl(col("id")))).as("d"))
      .as[String].collect().toSeq
    assert(d == Seq("example.com", "example.co.uk", "spam.example",
      "192.168.10.3", "ads.co.uk", "site.org", "example.com.au", "example.com"))
  }
}
