package graft

import org.apache.spark.sql.functions._
import graft.operators.Attribution

/** Decision table for the attribution expression trees — one row per branch
  * of reference main.py:466-702 (+ the documented null-dl divergence). */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private val S = "https://s.example"

  /** (label, dl, dr, isNew) -> expected (source, medium, campaign, keyword, adContent) */
  private val table: Seq[(String, (String, String, Int), (String, String, String, String, String))] = Seq(
    ("full utm set, no referrer",
      (s"$S/p?utm_source=nl&utm_medium=email&utm_campaign=c1&utm_term=k1&utm_content=a1", null, 1),
      ("nl", "email", "c1", "k1", "a1")),
    ("gclid click-id", (s"$S/p?gclid=x", null, 1),
      ("google", "paid", "(not set)", "(not set)", "(not set)")),
    ("dclid click-id", (s"$S/p?dclid=x", null, 1),
      ("google", "(none)", "(not set)", "(not set)", "(not set)")),
    ("fbclid", (s"$S/p?fbclid=z", null, 1),
      ("facebook", "(none)", "(not set)", "(not set)", "(not set)")),
    ("mscklid", (s"$S/p?mscklid=z", null, 1),
      ("bing", "(none)", "(not set)", "(not set)", "(not set)")),
    ("no query no referrer = direct", (s"$S/p", null, 1),
      ("(direct)", "(none)", "(not set)", "(not set)", "(not set)")),
    ("organic www.google.com", (s"$S/p", "https://www.google.com/", 1),
      ("google", "organic", "(not set)", "(not provided)", "(not set)")),
    ("google with search query -> referral medium quirk",
      (s"$S/p", "https://google.com/search?q=x", 1),
      ("google", "referral", "(not set)", "(not set)", "(not set)")),
    ("3-label referral host", (s"$S/p", "https://blog.partner.co/a", 1),
      ("partner", "referral", "(not set)", "(not set)", "(not set)")),
    ("android-app referrer", (s"$S/p", "android-app://com.news.reader", 1),
      ("com.news.reader", "referral", "(not set)", "(not set)", "(not set)")),
    ("www.googleadservices.com -> paid",
      (s"$S/p", "https://www.googleadservices.com/pagead/aclk?x=1", 1),
      ("google", "paid", "(not set)", "(not set)", "(not set)")),
    ("bare googleadservices.com -> referral medium quirk",
      (s"$S/p", "https://googleadservices.com/pagead?x=1", 1),
      ("google", "referral", "(not set)", "(not set)", "(not set)")),
    ("ref= param with empty-query referrer",
      (s"$S/p?ref=pp", "https://example.org/", 1),
      ("pp", "referral", "(not set)", "(not set)", "(not set)")),
    ("utm_source wins over non-empty referrer query",
      (s"$S/p?utm_source=u1&utm_campaign=cc", "https://t.example/r?x=1", 1),
      ("u1", "(none)", "cc", "(not set)", "(not set)")),
    ("null dl and dr (reference would crash) -> direct", (null, null, 1),
      ("(direct)", "(none)", "(not set)", "(not set)", "(not set)")),
    ("substring-matching key that is not an exact channel",
      (s"$S/p?xgclidy=1", null, 1),
      ("(not set)", "(none)", "(not set)", "(not set)", "(not set)")),
    ("channel key order: first match dispatches",
      (s"$S/p?dclid=1&utm_source=u", null, 1),
      ("google", "(none)", "(not set)", "(not set)", "(not set)")),
    ("blank utm_campaign value is kept as empty string",
      (s"$S/p?utm_campaign=", null, 1),
      ("(direct)", "(none)", "", "(not set)", "(not set)")),
    ("non-start hit gets constants",
      (s"$S/p?utm_source=nl&utm_medium=email", null, 0),
      ("(not set)", "(none)", "(not set)", "(not set)", "(not set)")))

  test("attribution decision table") {
    val rows = table.map { case (label, (dl, dr, isNew), _) => (label, dl, dr, isNew) }
    val df = rows.toDF("label", "dl", "dr", "is_new")
    val med = Attribution.medium(col("is_new"), col("dl"), col("dr"))
    val out = df.select(
      col("label"),
      Attribution.source(col("is_new"), col("dl"), col("dr")).as("src"),
      med.as("med"),
      Attribution.campaign(col("is_new"), col("dl")).as("cmp"),
      Attribution.keyword(col("is_new"), col("dl"), col("dr"), med).as("kw"),
      Attribution.adContent(col("is_new"), col("dl"), col("dr")).as("ad"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getString(5)))
      .toMap
    table.foreach { case (label, _, expected) =>
      assert(out(label) == expected, s"case '$label': got ${out(label)}, want $expected")
    }
  }

  test("page path levels (F2) and landing page (F9)") {
    val df = Seq(
      (s"$S/a/b/c/d/e", 1), (s"$S/a/b", 1), (s"$S/", 1), (s"$S/x//y/", 1))
      .toDF("dl", "is_new")
    val out = df.select(
      Attribution.pagePathLevels(col("dl")) :+
        Attribution.landingPage(col("is_new"), col("dl")).as("lp"): _*)
      .collect()
    assert(out(0).toSeq == Seq("/a", "/b", "/c", "/d", "/a/b/c/d/e"))
    assert(out(1).toSeq == Seq("/a", "/b", "", "", "/a/b"))
    assert(out(2).toSeq == Seq("", "", "", "", "/"))
    // empty segments are dropped before level construction
    assert(out(3).toSeq == Seq("/x", "/y", "", "", "/x//y/"))
  }

  test("reference's own test vectors (sessionization/tests.py, transformation/main.py unittests)") {
    // parse_page_path("http://www.example.com/hello-world/") == ["/hello-world","","",""]
    val lv = Seq(("http://www.example.com/hello-world/", 1)).toDF("dl", "is_new")
      .select(Attribution.pagePathLevels(col("dl")): _*).collect().head
    assert(lv.toSeq == Seq("/hello-world", "", "", ""))
    // anonymize_ip vectors live in IngestSpec (255.255.255.255 -> .0; ffff x8)
  }

  test("is_true_direct (F8)") {
    val out = Seq("(direct)", "google").toDF("s")
      .select(Attribution.isTrueDirect(col("s")).as("d")).collect()
    assert(out(0).getString(0) == "True")
    assert(out(1).isNullAt(0))
  }
}
