package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.enrich.{GeoIp, UserAgent}
import graft.ingest.Ingest
import graft.schema.GaSchemas

class EnrichmentSpec extends SparkTestBase {

  private val rawSchema = StructType(Seq(
    StructField("recordId", StringType), StructField("data", StringType)))

  private lazy val ingested = Ingest.fromFirehose(
    spark.read.schema(rawSchema).json("fixtures/ga/raw/records.jsonl"))
  private lazy val enrichedFixture = Ingest.readEnrichedHits(
    spark, "fixtures/ga/enriched/year=2019/month=09/day=23")
  private lazy val ranges = GeoIp.loadRanges(spark, "fixtures/geo/ip_ranges.csv")

  test("UA enrichment reproduces the enriched fixture's device columns") {
    val mine = UserAgent.withDeviceColumns(ingested, col("user_agent"))
      .select(("message_id" +: GaSchemas.deviceFields).map(col): _*)
      .orderBy("message_id").collect()
    val want = enrichedFixture
      .select(("message_id" +: GaSchemas.deviceFields).map(col): _*)
      .orderBy("message_id").collect()
    assert(mine.length == want.length)
    mine.zip(want).foreach { case (a, b) => assert(a == b, s"\n got $a\nwant $b") }
  }

  test("UA long tail: webview/in-app/TV/console families classify like uap-core") {
    import spark.implicits._
    // (ua, client_name, os_name, device_type, brand-or-null)
    val table = Seq(
      ("Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
        "Samsung Internet", "Android", "mobile", "Samsung"),
      ("Mozilla/5.0 (Linux; Android 10; K; wv) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/119.0.6045.66 Mobile Safari/537.36",
        "Chrome Mobile WebView", "Android", "mobile", null),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/20G81 [FBAN/FBIOS;FBAV/430.0.0.32.107;FBBV/0]",
        "Facebook", "iOS", "mobile", "Apple"),
      ("Mozilla/5.0 (Linux; Android 13; SM-G991B Build/TP1A.220624.014) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/114.0.0.0 Mobile Safari/537.36 Instagram 309.1.0.41.113",
        "Instagram", "Android", "mobile", "Samsung"),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/114.0.5735.99 Mobile/15E148 Safari/604.1",
        "Chrome Mobile iOS", "iOS", "mobile", "Apple"),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_3 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/112.1 Mobile/15E148 Safari/605.1.15",
        "Firefox iOS", "iOS", "mobile", "Apple"),
      ("Mozilla/5.0 (Linux; Android 10; HD1913) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/115.0.0.0 Mobile Safari/537.36 EdgA/115.0.1901.188",
        "Edge Mobile", "Android", "mobile", null),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_3 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) GSA/252.0.506590184 Mobile/15E148 Safari/604.1",
        "GSA", "iOS", "mobile", "Apple"),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS 15_5 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/15E148",
        "Mobile Safari UI/WKWebView", "iOS", "mobile", "Apple"),
      ("Opera/9.80 (J2ME/MIDP; Opera Mini/9.80 (S60; SymbOS; Opera Mobi/23.348; U; en) Presto/2.5.25 Version/10.54)",
        "Opera Mini", "Symbian OS", "mobile", null),
      ("Mozilla/5.0 (Linux; U; Android 13; en-US; 2201117TY) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 UCBrowser/13.4.0.1306 Mobile Safari/537.36",
        "UC Browser", "Android", "mobile", null),
      ("Mozilla/5.0 (Mobile; Nokia_8110_4G; rv:48.0) Gecko/48.0 Firefox/48.0 KAIOS/2.5",
        "Firefox Mobile", "KaiOS", "mobile", "Nokia"),
      ("Mozilla/5.0 (Windows Phone 10.0; Android 4.2.1; Microsoft; Lumia 950) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/46.0.2486.0 Mobile Safari/537.36 Edge/13.10586",
        "Edge", "Windows Phone", "mobile", null),
      ("Mozilla/5.0 (SMART-TV; Linux; Tizen 6.0) AppleWebKit/537.36 (KHTML, like Gecko) 76.0.3809.146/6.0 TV Safari/537.36",
        "Other", "Tizen", "tv", "Samsung"),
      ("Mozilla/5.0 (Web0S; Linux/SmartTV) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/79.0.3945.79 Safari/537.36 WebAppManager",
        "Chrome", "webOS", "tv", null),
      ("Mozilla/5.0 (Linux; Android 7.1.2; AFTMM Build/NS6265; wv) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/70.0.3538.110 Mobile Safari/537.36",
        "Chrome Mobile WebView", "Android", "tv", "Amazon"),
      ("Mozilla/5.0 (X11; Linux aarch64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/88.0.4324.109 Safari/537.36 CrKey/1.54.250320",
        "Chrome", "Linux", "tv", "Google"),
      ("Mozilla/5.0 (PlayStation; PlayStation 5/2.26) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.0 Safari/605.1.15",
        "Safari", "PlayStation", "console", "Sony"),
      ("Mozilla/5.0 (Windows NT 10.0; Win64; x64; Xbox; Xbox One) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/48.0.2564.82 Safari/537.36 Edge/20.02",
        "Edge", "Windows", "console", "Microsoft"),
      ("Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet) AppleWebKit/606.4 (KHTML, like Gecko) NF/6.0.1.15.4 NintendoBrowser/5.1.0.13343",
        "NintendoBrowser", "Nintendo", "console", "Nintendo"),
      // round-6 long tail: HTTP tools/SDKs, BB10, a second bot grammar
      ("curl/8.4.0", "curl", "Other", "(not set)", null),
      ("python-requests/2.31.0", "Python Requests", "Other", "(not set)", null),
      ("Python-urllib/3.9", "Python-urllib", "Other", "(not set)", null),
      ("Wget/1.21.3 (linux-gnu)", "Wget", "Other", "(not set)", null),
      ("Go-http-client/2.0", "Go-http-client", "Other", "(not set)", null),
      ("okhttp/4.12.0", "okhttp", "Other", "(not set)", null),
      ("Apache-HttpClient/4.5.14 (Java/17.0.8)",
        "Apache-HttpClient", "Other", "(not set)", null),
      ("Mozilla/5.0 (BB10; Touch) AppleWebKit/537.35+ (KHTML, like Gecko) Version/10.3.3.2205 Mobile Safari/537.35+",
        "BlackBerry WebKit", "BlackBerry OS", "mobile", "BlackBerry"),
      ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.230 Mobile Safari/537.36",
        "Chrome Mobile", "Android", "mobile", "Google"),
      ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) HeadlessChrome/118.0.0.0 Safari/537.36",
        "HeadlessChrome", "Linux", "desktop", null),
      ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/106.0.0.0 YaBrowser/22.11.5.715 Yowser/2.5 Safari/537.36",
        "Yandex Browser", "Windows", "desktop", null),
      ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/103.0.5060.114 Safari/537.36",
        "Chrome", "Chrome OS", "desktop", null),
      ("Mozilla/5.0 (Linux; Android 9; KFMAWI) AppleWebKit/537.36 (KHTML, like Gecko) Silk/94.2.10 like Chrome/94.0.4606.71 Safari/537.36",
        "Amazon Silk", "Android", "tablet", "Amazon"))
    val out = UserAgent.withDeviceColumns(
      table.map(_._1).toDF("user_agent"), col("user_agent"))
      .select("user_agent", "device_client_name", "device_os_name",
        "device_device_type", "device_device_brand")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    table.foreach { case (ua, name, os, tpe, brand) =>
      assert(out(ua) == ((name, os, tpe, brand)),
        s"\nUA: $ua\n got ${out(ua)}\nwant ${(name, os, tpe, brand)}")
    }
    // tv/console are never mobile
    val m = UserAgent.withDeviceColumns(
      table.map(_._1).toDF("user_agent"), col("user_agent"))
      .filter(col("device_device_type").isin("tv", "console") &&
        col("device_is_mobile")).count()
    assert(m == 0)
    // console OS versions: space (PS4) and slash (PS5) forms both parse
    val vers = UserAgent.withDeviceColumns(Seq(
      "Mozilla/5.0 (PlayStation 4 8.03) AppleWebKit/605.1.15 (KHTML, like Gecko)",
      "Mozilla/5.0 (PlayStation; PlayStation 5/2.26) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.0 Safari/605.1.15")
      .toDF("user_agent"), col("user_agent"))
      .select("device_os_version").as[String].collect().toSeq
    assert(vers == Seq("8.03", "2.26"))
  }

  test("bot rows carry only the bot flag") {
    val bots = UserAgent.withDeviceColumns(ingested, col("user_agent"))
      .filter(col("device_is_bot"))
    assert(bots.count() == 3) // v16's two hits + v74 (facebookexternalhit)
    assert(bots.filter(col("device_client_name").isNotNull).count() == 0)
  }

  test("GeoIP bucket join reproduces the enriched fixture's geo columns (v4)") {
    val withBot = UserAgent.withDeviceColumns(ingested, col("user_agent"))
    val mine = GeoIp.withGeoColumns(withBot, ranges, col("ip"), col("device_is_bot"))
      .filter(col("body_cid") =!= "cid-v19") // v6 visitor: dimension is v4-only
      .select(("message_id" +: GaSchemas.geoFields).map(col): _*)
      .orderBy("message_id").collect()
    val want = enrichedFixture
      .filter(col("body_cid") =!= "cid-v19")
      .select(("message_id" +: GaSchemas.geoFields).map(col): _*)
      .orderBy("message_id").collect()
    assert(mine.length == want.length)
    mine.zip(want).foreach { case (a, b) => assert(a == b, s"\n got $a\nwant $b") }
  }

  test("lookup miss yields (not set) strings and null lat/lon; bots all-null") {
    import spark.implicits._
    val df = Seq(("10.9.9.9", false), ("84.113.10.61", true), ("::1", false))
      .toDF("ip", "bot")
    val out = GeoIp.withGeoColumns(df, ranges, col("ip"), col("bot"))
      .select("geo_country", "geo_latitude").collect()
    assert(out(0).getString(0) == "(not set)" && out(0).isNullAt(1)) // miss
    assert(out(1).isNullAt(0)) // bot: skipped lookup
    assert(out(2).getString(0) == "(not set)") // v6 = miss
  }

  test("geo join is a broadcast hash join, not a nested loop") {
    val plan = GeoIp.withGeoColumns(ingested, ranges, col("ip"), lit(false))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
