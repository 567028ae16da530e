package graft.tools

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Deterministic GA fixture generator (no randomness, no Spark).
  *
  * Emits the two input shapes of the reference pipeline (FIXTURES.md):
  *  - `fixtures/ga/raw/records.jsonl` — Firehose-style records
  *    `{recordId, data}` where `data` is base64 of the JSON envelope with a
  *    URL-encoded GA Measurement-Protocol body (collector-ga.yaml:266-290).
  *  - `fixtures/ga/enriched/year=2019/month=09/day=23/part-00000.jsonl` —
  *    ragged-key enriched hits (envelope + decoded `body_*` + `device_*` +
  *    `geo_*`), the sessionization job's input.
  *
  * Both shapes are generated from one hit model, so raw → Ingest must
  * reproduce the enriched `body_*` columns exactly (tested in IngestSpec).
  *
  * Coverage: 30-min session gaps, every traffic-attribution branch of
  * reference main.py:466-702 (utm/click-ids/direct/organic/referral/
  * googleadservices quirks/android-app/ref param), all hit types incl.
  * dropped timing/adtiming, enhanced ecommerce with multi-product purchase
  * (brand `br` included), custom dims/metrics, bots, IPv6, duplicate and
  * blank query params, same-millisecond ties, and a session spanning the
  * midnight partition boundary.
  */
object MakeGaFixtures {

  val Base: Long = 1569225600000L // 2019-09-23T08:00:00Z
  val Minute: Long = 60000L

  type Params = Seq[(String, String)]

  case class Visitor(
      cid: String,
      ip: String,
      ua: String,
      device: Seq[(String, Any)],
      geo: Seq[(String, Any)],
      hits: Seq[(Long, Params)])

  // ----------------------------------------------------------- device/geo
  private val deviceMobile: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Mobile Safari", "device_client_version" -> "12.1.2",
    "device_os_name" -> "iOS", "device_os_version" -> "12.4",
    "device_device_type" -> "mobile", "device_device_name" -> "iPhone",
    "device_device_brand" -> "Apple", "device_device_model" -> "iPhone",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val deviceDesktop: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> "Chrome", "device_client_version" -> "76.0.3809",
    "device_os_name" -> "Windows", "device_os_version" -> "10",
    "device_device_type" -> "desktop", "device_device_name" -> "Other",
    "device_device_brand" -> null, "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val deviceBot: Seq[(String, Any)] = Seq("device_is_bot" -> true)

  private val geoVienna: Seq[(String, Any)] = Seq(
    "geo_continent" -> "Europe", "geo_continent_code" -> "EU",
    "geo_sub_continent" -> "(not set)", "geo_country" -> "Austria",
    "geo_country_iso" -> "AT", "geo_region" -> "Vienna",
    "geo_metro" -> "(not set)", "geo_city" -> "Vienna",
    "geo_city_id" -> "2761369", "geo_postal_code" -> "1010",
    "geo_latitude" -> 48.2082, "geo_longitude" -> 16.3738,
    "geo_timezone" -> "Europe/Vienna",
    "geo_network_domain" -> "(not set)", "geo_network_location" -> "(not set)")

  private val geoBerlin: Seq[(String, Any)] = Seq(
    "geo_continent" -> "Europe", "geo_continent_code" -> "EU",
    "geo_sub_continent" -> "(not set)", "geo_country" -> "Germany",
    "geo_country_iso" -> "DE", "geo_region" -> "Berlin",
    "geo_metro" -> "(not set)", "geo_city" -> "Berlin",
    "geo_city_id" -> "2950159", "geo_postal_code" -> "10115",
    "geo_latitude" -> 52.5244, "geo_longitude" -> 13.4105,
    "geo_timezone" -> "Europe/Berlin",
    "geo_network_domain" -> "(not set)", "geo_network_location" -> "(not set)")

  private val uaIphone =
    "Mozilla/5.0 (iPhone; CPU iPhone OS 12_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/12.1.2 Mobile/15E148 Safari/604.1"
  private val uaChrome =
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/76.0.3809.132 Safari/537.36"
  private val uaBot =
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"

  // ---- UA long tail (v57-v62): device maps mirror enrich/UserAgent's
  // classifier output exactly (EnrichmentSpec asserts the round trip,
  // q18's oracle gates the classification).
  private val uaSamsung =
    "Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36"
  private val deviceSamsung: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Samsung Internet", "device_client_version" -> "23.0",
    "device_os_name" -> "Android", "device_os_version" -> "13",
    "device_device_type" -> "mobile", "device_device_name" -> "SM-S918B",
    "device_device_brand" -> "Samsung", "device_device_model" -> "SM-S918B",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaWebview =
    "Mozilla/5.0 (Linux; Android 10; K; wv) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/119.0.6045.66 Mobile Safari/537.36"
  private val deviceWebview: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Chrome Mobile WebView", "device_client_version" -> "119.0.6045",
    "device_os_name" -> "Android", "device_os_version" -> "10",
    "device_device_type" -> "mobile", "device_device_name" -> "Generic Smartphone",
    "device_device_brand" -> null, "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaEdgeAndroid =
    "Mozilla/5.0 (Linux; Android 10; HD1913) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/115.0.0.0 Mobile Safari/537.36 EdgA/115.0.1901.188"
  private val deviceEdgeAndroid: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Edge Mobile", "device_client_version" -> "115.0.1901",
    "device_os_name" -> "Android", "device_os_version" -> "10",
    "device_device_type" -> "mobile", "device_device_name" -> "HD1913",
    "device_device_brand" -> null, "device_device_model" -> "HD1913",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaCrios =
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/114.0.5735.99 Mobile/15E148 Safari/604.1"
  private val deviceCrios: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Chrome Mobile iOS", "device_client_version" -> "114.0.5735",
    "device_os_name" -> "iOS", "device_os_version" -> "16.5",
    "device_device_type" -> "mobile", "device_device_name" -> "iPhone",
    "device_device_brand" -> "Apple", "device_device_model" -> "iPhone",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaTizenTv =
    "Mozilla/5.0 (SMART-TV; Linux; Tizen 6.0) AppleWebKit/537.36 (KHTML, like Gecko) 76.0.3809.146/6.0 TV Safari/537.36"
  private val deviceTizenTv: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> "Other", "device_client_version" -> "",
    "device_os_name" -> "Tizen", "device_os_version" -> "6.0",
    "device_device_type" -> "tv", "device_device_name" -> "Other",
    "device_device_brand" -> "Samsung", "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaPs5 =
    "Mozilla/5.0 (PlayStation; PlayStation 5/2.26) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.0 Safari/605.1.15"
  private val devicePs5: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> "Safari", "device_client_version" -> "13.0",
    "device_os_name" -> "PlayStation", "device_os_version" -> "2.26",
    "device_device_type" -> "console", "device_device_name" -> "PlayStation",
    "device_device_brand" -> "Sony", "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  // ---- UA long tail, round 6 (v63-v78): HTTP tools/SDKs, feature
  // phones, console browsers, more in-market alt browsers. A helper for
  // the tool shape (no OS / device tokens at all).
  private def deviceTool(name: String, version: String): Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> name, "device_client_version" -> version,
    "device_os_name" -> "Other", "device_os_version" -> "",
    "device_device_type" -> "(not set)", "device_device_name" -> "Other",
    "device_device_brand" -> null, "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaCurl = "curl/8.4.0"
  private val uaRequests = "python-requests/2.31.0"
  private val uaWget = "Wget/1.21.3 (linux-gnu)"
  private val uaGoHttp = "Go-http-client/2.0"
  private val uaOkhttp = "okhttp/4.12.0"
  private val uaHttpClient = "Apache-HttpClient/4.5.14 (Java/17.0.8)"

  private val uaKaios =
    "Mozilla/5.0 (Mobile; LYF/F300B/LYF-F300B-001-02-15-130718-i;rv:48.0) Gecko/48.0 Firefox/48.0 KAIOS/2.5"
  private val deviceKaios: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Firefox Mobile", "device_client_version" -> "48.0",
    "device_os_name" -> "KaiOS", "device_os_version" -> "2.5",
    "device_device_type" -> "mobile", "device_device_name" -> "Other",
    "device_device_brand" -> null, "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaSwitch =
    "Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet) AppleWebKit/606.4 (KHTML, like Gecko) NF/6.0.1.15.4 NintendoBrowser/5.1.0.20393"
  private val deviceSwitch: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> "NintendoBrowser", "device_client_version" -> "5.1.0",
    "device_os_name" -> "Nintendo", "device_os_version" -> "",
    "device_device_type" -> "console", "device_device_name" -> "Nintendo Switch",
    "device_device_brand" -> "Nintendo", "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaXbox =
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; Xbox; Xbox One) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/48.0.2564.82 Safari/537.36 Edge/20.02"
  private val deviceXbox: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> "Edge", "device_client_version" -> "20.02",
    "device_os_name" -> "Windows", "device_os_version" -> "10",
    "device_device_type" -> "console", "device_device_name" -> "Xbox",
    "device_device_brand" -> "Microsoft", "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaBb10 =
    "Mozilla/5.0 (BB10; Touch) AppleWebKit/537.35+ (KHTML, like Gecko) Version/10.3.3.2205 Mobile Safari/537.35+"
  private val deviceBb10: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "BlackBerry WebKit", "device_client_version" -> "10.3.3",
    "device_os_name" -> "BlackBerry OS", "device_os_version" -> "10.3.3",
    "device_device_type" -> "mobile", "device_device_name" -> "Other",
    "device_device_brand" -> "BlackBerry", "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaOperaMini =
    "Opera/9.80 (J2ME/MIDP; Opera Mini/9.80 (S60; SymbOS; Opera Mobi/23.348; U; en) Presto/2.5.25 Version/10.54"
  private val deviceOperaMini: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Opera Mini", "device_client_version" -> "9.80",
    "device_os_name" -> "Symbian OS", "device_os_version" -> "",
    "device_device_type" -> "mobile", "device_device_name" -> "Other",
    "device_device_brand" -> null, "device_device_model" -> null,
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaFbBot =
    "facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)"

  private val uaUc =
    "Mozilla/5.0 (Linux; U; Android 12; en-US; V2154 Build/SP1A.210812.003) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 UCBrowser/13.4.0.1306 Mobile Safari/537.36"
  private val deviceUc: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "UC Browser", "device_client_version" -> "13.4.0",
    "device_os_name" -> "Android", "device_os_version" -> "12",
    "device_device_type" -> "mobile", "device_device_name" -> "V2154",
    "device_device_brand" -> null, "device_device_model" -> "V2154",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaSilk =
    "Mozilla/5.0 (Linux; Android 9; KFMAWI) AppleWebKit/537.36 (KHTML, like Gecko) Silk/112.2.1 like Chrome/112.0.5615.213 Safari/537.36"
  private val deviceSilk: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> false,
    "device_client_name" -> "Amazon Silk", "device_client_version" -> "112.2.1",
    "device_os_name" -> "Android", "device_os_version" -> "9",
    "device_device_type" -> "tablet", "device_device_name" -> "KFMAWI",
    "device_device_brand" -> "Amazon", "device_device_model" -> "KFMAWI",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaFxios =
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/116.2 Mobile/15E148 Safari/605.1.15"
  private val deviceFxios: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Firefox iOS", "device_client_version" -> "116.2",
    "device_os_name" -> "iOS", "device_os_version" -> "16.6",
    "device_device_type" -> "mobile", "device_device_name" -> "iPhone",
    "device_device_brand" -> "Apple", "device_device_model" -> "iPhone",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  private val uaYandex =
    "Mozilla/5.0 (Linux; Android 11; Redmi Note 8 Pro) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/110.0.0.0 YaBrowser/23.3.4.461 Mobile Safari/537.36"
  private val deviceYandex: Seq[(String, Any)] = Seq(
    "device_is_bot" -> false, "device_is_mobile" -> true,
    "device_client_name" -> "Yandex Browser", "device_client_version" -> "23.3.4",
    "device_os_name" -> "Android", "device_os_version" -> "11",
    "device_device_type" -> "mobile", "device_device_name" -> "Redmi Note 8 Pro",
    "device_device_brand" -> "XiaoMi", "device_device_model" -> "Redmi Note 8 Pro",
    "device_device_input" -> "(not set)", "device_device_info" -> "(not set)")

  // ------------------------------------------------------------- builders
  private val shop = "https://shop.example"

  private def baseParams(cid: String, t: String): Params = Seq(
    "v" -> "1", "tid" -> "UA-59051461-1", "cid" -> cid, "t" -> t,
    "ul" -> "de-at", "de" -> "UTF-8", "sr" -> "375x812", "vp" -> "375x635",
    "sd" -> "24-bit", "je" -> "0")

  private def pv(cid: String, dl: String, dr: Option[String] = None,
                 extra: Params = Nil): Params =
    baseParams(cid, "pageview") ++ Seq("dl" -> dl, "dt" -> "Title") ++
      dr.map("dr" -> _).toSeq ++ extra

  private def ev(cid: String, dl: String, ec: String, ea: String,
                 extra: Params = Nil): Params =
    baseParams(cid, "event") ++ Seq("dl" -> dl, "ec" -> ec, "ea" -> ea) ++ extra

  private def m(off: Double): Long = Base + (off * Minute).toLong

  // ------------------------------------------------------------- visitors
  def visitors: Seq[Visitor] = {
    val scenario = Seq(
      // v01: utm campaign; 2 sessions (45-min gap); multi-product purchase
      // with brand, transaction + item hits in session 2.
      Visitor("cid-v01", "84.113.10.61", uaIphone, deviceMobile, geoVienna, Seq(
        m(0) -> pv("cid-v01", s"$shop/de/start?utm_source=nl_13&utm_medium=email&utm_campaign=nl19&utm_term=shoes sale&utm_content=banner_a"),
        m(3) -> pv("cid-v01", s"$shop/de/shoes/running"),
        m(50) -> pv("cid-v01", s"$shop/de/cart"),
        m(52) -> ev("cid-v01", s"$shop/de/checkout/done", "ecommerce", "purchase", Seq(
          "pa" -> "purchase", "ti" -> "T1001", "tr" -> "99.75", "ts" -> "4.25",
          "tt" -> "19.5", "cu" -> "EUR", "tcc" -> "SUMMER19",
          "pr0id" -> "SKU-1", "pr0nm" -> "Road Runner", "pr0br" -> "BrandA",
          "pr0ca" -> "Shoes", "pr0va" -> "42", "pr0pr" -> "59.5", "pr0qt" -> "1",
          "pr1id" -> "SKU-2", "pr1nm" -> "Trail Blazer", "pr1br" -> "BrandB",
          "pr1ca" -> "Shoes", "pr1va" -> "43", "pr1pr" -> "40.25", "pr1qt" -> "1")),
        m(53) -> (baseParams("cid-v01", "transaction") ++ Seq(
          "dl" -> s"$shop/de/checkout/done", "ti" -> "T1001", "ta" -> "web",
          "tr" -> "99.75", "ts" -> "4.25", "tt" -> "19.5", "cu" -> "EUR")),
        m(54) -> (baseParams("cid-v01", "item") ++ Seq(
          "dl" -> s"$shop/de/checkout/done", "ti" -> "T1001", "in" -> "Road Runner",
          "ip" -> "59.5", "iq" -> "1", "ic" -> "SKU-1", "iv" -> "Shoes", "cu" -> "EUR")),
        m(54.5) -> (baseParams("cid-v01", "item") ++ Seq(
          "dl" -> s"$shop/de/checkout/done", "ti" -> "T1001", "in" -> "Trail Blazer",
          "ip" -> "40.25", "iq" -> "1", "ic" -> "SKU-2", "iv" -> "Shoes", "cu" -> "EUR")))),
      // v02: gclid paid click; product detail view (action_type 2, no revenue).
      Visitor("cid-v02", "84.113.11.20", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(1) -> pv("cid-v02", s"$shop/p/42?gclid=abc123"),
        m(2) -> ev("cid-v02", s"$shop/p/42?gclid=abc123", "ecommerce", "detail", Seq(
          "pa" -> "detail", "pr0id" -> "SKU-42", "pr0nm" -> "Gadget",
          "pr0br" -> "BrandC", "pr0ca" -> "Gadgets", "pr0pr" -> "19.75", "pr0qt" -> "1")))),
      // v03: direct; deep path for page-path levels (>=4 truncates).
      Visitor("cid-v03", "84.113.12.5", uaIphone, deviceMobile, geoVienna, Seq(
        m(2) -> pv("cid-v03", s"$shop/a/b/c/d/e"),
        m(4) -> pv("cid-v03", s"$shop/a/b"),
        m(6) -> pv("cid-v03", s"$shop/"))),
      // v04: organic — www.google.com referrer, no queries.
      Visitor("cid-v04", "84.113.13.7", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(5) -> pv("cid-v04", s"$shop/landing", Some("https://www.google.com/")))),
      // v05: search referrer WITH query → source google, medium referral (quirk).
      Visitor("cid-v05", "84.113.14.9", uaIphone, deviceMobile, geoVienna, Seq(
        m(6) -> pv("cid-v05", s"$shop/landing", Some("https://google.com/search?q=shoes")))),
      // v06: 3-label referral host.
      Visitor("cid-v06", "84.113.15.2", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(7) -> pv("cid-v06", s"$shop/post", Some("https://blog.partner.co/article/1")))),
      // v07: android-app referrer.
      Visitor("cid-v07", "84.113.16.3", uaIphone, deviceMobile, geoVienna, Seq(
        m(8) -> pv("cid-v07", s"$shop/app-landing", Some("android-app://com.news.reader")))),
      // v08: www.googleadservices.com → source google, medium paid.
      Visitor("cid-v08", "84.113.17.4", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(9) -> pv("cid-v08", s"$shop/promo", Some("https://www.googleadservices.com/pagead/aclk?x=1")))),
      // v09: bare googleadservices.com → source google, medium referral
      // (reference parse_dr_medium hostname quirk takes label [1] = 'com').
      Visitor("cid-v09", "84.113.18.6", uaIphone, deviceMobile, geoVienna, Seq(
        m(10) -> pv("cid-v09", s"$shop/promo", Some("https://googleadservices.com/pagead?x=1")))),
      // v10: dl ref= param with empty-query referrer → source from ref.
      Visitor("cid-v10", "84.113.19.8", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(11) -> pv("cid-v10", s"$shop/lp?ref=partnerx", Some("https://example.org/")))),
      // v11: fbclid → facebook, medium (none) (identify_medium has no fbclid branch).
      Visitor("cid-v11", "84.113.20.1", uaIphone, deviceMobile, geoVienna, Seq(
        m(12) -> pv("cid-v11", s"$shop/lp?fbclid=xyz"))),
      // v12: mscklid (bing) session, then dclid (google) session 45 min later.
      Visitor("cid-v12", "84.113.21.2", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(13) -> pv("cid-v12", s"$shop/lp?mscklid=m1"),
        m(58.5) -> pv("cid-v12", s"$shop/lp?dclid=d1"))),
      // v13: app screenviews without dl (reference UDF would crash on null
      // dl; our expressions define null/empty → '(direct)').
      Visitor("cid-v13", "84.113.22.3", uaIphone, deviceMobile, geoVienna, Seq(
        m(14) -> (baseParams("cid-v13", "screenview") ++ Seq(
          "an" -> "MyApp", "av" -> "1.2", "aid" -> "com.my.app", "cd" -> "HomeScreen")),
        m(15) -> (baseParams("cid-v13", "screenview") ++ Seq(
          "an" -> "MyApp", "av" -> "1.2", "aid" -> "com.my.app", "cd" -> "DetailScreen")))),
      // v14: social / exception / unknown hit types.
      Visitor("cid-v14", "84.113.23.4", uaChrome, deviceDesktop, geoBerlin, Seq(
        m(16) -> (baseParams("cid-v14", "social") ++ Seq("dl" -> s"$shop/share")),
        m(17) -> (baseParams("cid-v14", "exception") ++ Seq("dl" -> s"$shop/err")),
        m(18) -> (baseParams("cid-v14", "foo") ++ Seq("dl" -> s"$shop/odd")))),
      // v15: timing + adtiming (dropped by P4) around a real pageview.
      Visitor("cid-v15", "84.113.24.5", uaIphone, deviceMobile, geoVienna, Seq(
        m(19) -> (baseParams("cid-v15", "timing") ++ Seq("dl" -> s"$shop/t1")),
        m(20) -> pv("cid-v15", s"$shop/real"),
        m(21) -> (baseParams("cid-v15", "adtiming") ++ Seq("dl" -> s"$shop/t2")))),
      // v16: bot traffic (device has only is_bot; no geo — reference
      // enrichment skips geo lookup for bots).
      Visitor("cid-v16", "66.249.66.1", uaBot, deviceBot, Nil, Seq(
        m(22) -> pv("cid-v16", s"$shop/"),
        m(23) -> pv("cid-v16", s"$shop/robots"))),
      // v17: session spanning the midnight partition boundary (starts
      // 2019-09-22 23:50Z) + a separate on-date session.
      Visitor("cid-v17", "84.113.25.6", uaChrome, deviceDesktop, geoBerlin, Seq(
        (Base - 490 * Minute) -> pv("cid-v17", s"$shop/night"),
        (Base - 485 * Minute) -> pv("cid-v17", s"$shop/night/2"),
        m(25) -> pv("cid-v17", s"$shop/morning"))),
      // v18: userId + custom dims/metrics.
      Visitor("cid-v18", "84.113.26.7", uaIphone, deviceMobile, geoVienna, Seq(
        m(26) -> pv("cid-v18", s"$shop/me", extra = Seq(
          "uid" -> "user-18", "cd0" -> "tier-gold", "cd1" -> "beta",
          "cd2" -> "eu", "cm0" -> "7")))),
      // v19: IPv6 client.
      Visitor("cid-v19", "2001:db8:85a3:8d3:1319:8a2e:370:7348", uaChrome,
        deviceDesktop, geoBerlin, Seq(
          m(27) -> pv("cid-v19", s"$shop/v6"))),
      // v20: same-millisecond tie, blank + duplicate params, checkout
      // funnel action types (5, 8, 1, 3, 7, unknown→0).
      Visitor("cid-v20", "84.113.27.8", uaIphone, deviceMobile, geoVienna, Seq(
        m(28) -> ev("cid-v20", s"$shop/c", "funnel", "click", Seq(
          "pa" -> "click", "pr0id" -> "SKU-9", "pr0pr" -> "10.5", "pr0qt" -> "2")),
        m(28) -> ev("cid-v20", s"$shop/c", "funnel", "add", Seq(
          "pa" -> "add", "pr0id" -> "SKU-9", "pr0pr" -> "10.5", "pr0qt" -> "2")),
        m(29) -> ev("cid-v20", s"$shop/c", "funnel", "checkout", Seq(
          "pa" -> "checkout", "cos" -> "1", "col" -> "visa",
          "el" -> "", "ev" -> "0", "cu" -> "EUR", "cu" -> "USD")),
        m(30) -> ev("cid-v20", s"$shop/c", "funnel", "checkout_option", Seq(
          "pa" -> "checkout_option", "cos" -> "2", "col" -> "express")),
        m(31) -> ev("cid-v20", s"$shop/c", "funnel", "refund", Seq(
          "pa" -> "refund", "ti" -> "T1002", "tr" -> "10.5",
          "pr0id" -> "SKU-9", "pr0pr" -> "10.5", "pr0qt" -> "1")),
        m(32) -> ev("cid-v20", s"$shop/c", "funnel", "remove", Seq(
          "pa" -> "remove", "pr0id" -> "SKU-9")))),
      // v57-v62: UA long tail — in-app/webview browsers, a smart TV and a
      // console — one pageview session each, so the enrichment oracle
      // (q18) gates the classifier's long-tail families, not just the
      // three mainstream UAs.
      Visitor("cid-v57", "84.113.30.2", uaSamsung, deviceSamsung, geoVienna, Seq(
        m(33) -> pv("cid-v57", s"$shop/longtail/samsung"))),
      Visitor("cid-v58", "84.113.31.3", uaWebview, deviceWebview, geoBerlin, Seq(
        m(34) -> pv("cid-v58", s"$shop/longtail/webview"))),
      Visitor("cid-v59", "84.113.32.4", uaEdgeAndroid, deviceEdgeAndroid, geoVienna, Seq(
        m(35) -> pv("cid-v59", s"$shop/longtail/edga"))),
      Visitor("cid-v60", "84.113.33.5", uaCrios, deviceCrios, geoBerlin, Seq(
        m(36) -> pv("cid-v60", s"$shop/longtail/crios"))),
      Visitor("cid-v61", "84.113.34.6", uaTizenTv, deviceTizenTv, geoVienna, Seq(
        m(37) -> pv("cid-v61", s"$shop/longtail/tv"))),
      Visitor("cid-v62", "84.113.35.7", uaPs5, devicePs5, geoBerlin, Seq(
        m(38) -> pv("cid-v62", s"$shop/longtail/console"))),
      // v63-v78: round-6 long tail — HTTP tools/SDKs (the measurement-
      // protocol-from-a-script shape), feature phones, console browsers,
      // more alt browsers, and a second bot grammar (facebookexternalhit,
      // a Spider device family with no 'bot' token).
      Visitor("cid-v63", "84.113.40.1", uaCurl, deviceTool("curl", "8.4.0"),
        geoVienna, Seq(m(39) -> pv("cid-v63", s"$shop/longtail/curl"))),
      Visitor("cid-v64", "84.113.41.2", uaRequests,
        deviceTool("Python Requests", "2.31.0"), geoBerlin,
        Seq(m(40) -> pv("cid-v64", s"$shop/longtail/requests"))),
      Visitor("cid-v65", "84.113.42.3", uaWget, deviceTool("Wget", "1.21.3"),
        geoVienna, Seq(m(41) -> pv("cid-v65", s"$shop/longtail/wget"))),
      Visitor("cid-v66", "84.113.43.4", uaGoHttp,
        deviceTool("Go-http-client", "2.0"), geoBerlin,
        Seq(m(42) -> pv("cid-v66", s"$shop/longtail/go"))),
      Visitor("cid-v67", "84.113.44.5", uaOkhttp, deviceTool("okhttp", "4.12.0"),
        geoVienna, Seq(m(43) -> pv("cid-v67", s"$shop/longtail/okhttp"))),
      Visitor("cid-v68", "84.113.45.6", uaHttpClient,
        deviceTool("Apache-HttpClient", "4.5.14"), geoBerlin,
        Seq(m(44) -> pv("cid-v68", s"$shop/longtail/httpclient"))),
      Visitor("cid-v69", "84.113.46.1", uaKaios, deviceKaios, geoVienna, Seq(
        m(45) -> pv("cid-v69", s"$shop/longtail/kaios"))),
      Visitor("cid-v70", "84.113.47.2", uaSwitch, deviceSwitch, geoBerlin, Seq(
        m(46) -> pv("cid-v70", s"$shop/longtail/switch"))),
      Visitor("cid-v71", "84.113.48.3", uaXbox, deviceXbox, geoVienna, Seq(
        m(47) -> pv("cid-v71", s"$shop/longtail/xbox"))),
      Visitor("cid-v72", "84.113.49.4", uaBb10, deviceBb10, geoBerlin, Seq(
        m(48) -> pv("cid-v72", s"$shop/longtail/bb10"))),
      Visitor("cid-v73", "84.113.50.5", uaOperaMini, deviceOperaMini, geoVienna,
        Seq(m(49) -> pv("cid-v73", s"$shop/longtail/operamini"))),
      Visitor("cid-v74", "66.220.149.32", uaFbBot, deviceBot, Nil, Seq(
        m(50) -> pv("cid-v74", s"$shop/longtail/fbshare"))),
      Visitor("cid-v75", "84.113.51.1", uaUc, deviceUc, geoBerlin, Seq(
        m(51) -> pv("cid-v75", s"$shop/longtail/uc"))),
      Visitor("cid-v76", "84.113.52.2", uaSilk, deviceSilk, geoVienna, Seq(
        m(52) -> pv("cid-v76", s"$shop/longtail/silk"))),
      Visitor("cid-v77", "84.113.53.3", uaFxios, deviceFxios, geoBerlin, Seq(
        m(53) -> pv("cid-v77", s"$shop/longtail/fxios"))),
      Visitor("cid-v78", "84.113.54.4", uaYandex, deviceYandex, geoVienna, Seq(
        m(54) -> pv("cid-v78", s"$shop/longtail/yandex"))),
      // v79: hostile body content — multi-line page title (with the
      // duplicate-dt LAST_WIN overwrite), CJK/emoji category, CRLF+tab
      // event label (the q60/q61 fixture-coverage pattern applied to the
      // GA side: S7 URL-decode, P10 flatten, JSON escaping and the
      // oracle's own JSON read must all round-trip identical bytes).
      Visitor("cid-v79", "84.113.55.5", uaIphone, deviceMobile, geoVienna, Seq(
        m(55) -> pv("cid-v79", s"$shop/longtail/ml", extra = Seq(
          "dt" -> "Zeile 1\nZeile 2 — 日本語 😀 \"quoted\"")),
        m(56) -> ev("cid-v79", s"$shop/longtail/ml", "コンテンツ", "tap\ntwice",
          Seq("el" -> "emoji 😀 label\r\nwith CRLF\tand tab")))))

    // Bulk visitors b21..b56: 3-hit single sessions rotating over four
    // acquisition shapes; every 5th buys one product.
    val bulk = (21 to 56).map { i =>
      val cid = f"cid-b$i%02d"
      val (dl, dr): (String, Option[String]) = (i % 4) match {
        case 0 => (s"$shop/lp?utm_source=nl_$i&utm_medium=email&utm_campaign=aut19", None)
        case 1 => (s"$shop/lp", None)
        case 2 => (s"$shop/lp?gclid=g$i", None)
        case _ => (s"$shop/lp", Some("https://www.google.com/"))
      }
      val (ua, device, geo) =
        if (i % 2 == 0) (uaIphone, deviceMobile, geoVienna)
        else (uaChrome, deviceDesktop, geoBerlin)
      val start = Base + (40 + i) * Minute + i * 17
      val buys = i % 5 == 0
      val hits = Seq(
        start -> pv(cid, dl, dr),
        (start + 3 * Minute) -> pv(cid, s"$shop/lp/detail"),
        (start + 7 * Minute) ->
          (if (buys)
            ev(cid, s"$shop/lp/buy", "ecommerce", "purchase", Seq(
              "pa" -> "purchase", "ti" -> s"T$i", "tr" -> s"$i.25", "cu" -> "EUR",
              "pr0id" -> s"SKU-B$i", "pr0nm" -> s"Bulk $i", "pr0br" -> "BrandB",
              "pr0ca" -> "Bulk", "pr0pr" -> s"$i.25", "pr0qt" -> "1"))
          else pv(cid, s"$shop/lp/end")))
      Visitor(cid, s"84.113.${100 + (i % 50)}.$i", ua, device, geo, hits)
    }
    scenario ++ bulk
  }

  // --------------------------------------------------------- JSON emission
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case d: Double => d.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case s: String => jstr(s)
    case other => jstr(other.toString)
  }

  private def jobj(fields: Seq[(String, Any)]): String =
    fields.map { case (k, v) => jstr(k) + ":" + jval(v) }.mkString("{", ",", "}")

  /** Python parse_qsl semantics: drop blank values, last duplicate wins —
    * applied when building the enriched (post-transformation) shape. */
  private def parsedBody(params: Params): Params = {
    val kept = params.filter(_._2.nonEmpty)
    val lastWin = kept.map(_._1).distinct.map { k => k -> kept.filter(_._1 == k).last._2 }
    lastWin
  }

  private def anonIp(ip: String): String =
    if (ip.indexOf('.') > 0) ip.split('.').take(3).mkString(".") + ".0"
    else if (ip.indexOf(':') > 0)
      (ip.split(':').take(3) ++ Seq.fill(5)("0000")).mkString(":")
    else "0.0.0.0"

  private def urlEncode(s: String): String =
    URLEncoder.encode(s, "UTF-8")

  def main(args: Array[String]): Unit = {
    val outRoot = if (args.nonEmpty) args(0) else "fixtures/ga"
    val rawDir = Paths.get(s"$outRoot/raw")
    val enrichedDir = Paths.get(s"$outRoot/enriched/year=2019/month=09/day=23")
    Files.createDirectories(rawDir)
    Files.createDirectories(enrichedDir)

    // One global hit list, ordered by (receive time, cid) with sequential
    // message ids — deterministic end to end.
    val hits = visitors.flatMap { v =>
      v.hits.map { case (ts, params) => (ts, v, params) }
    }.sortBy { case (ts, v, _) => (ts, v.cid) }
      .zipWithIndex.map { case ((ts, v, params), i) => (f"m$i%04d", ts, v, params) }

    val raw = hits.map { case (msgId, ts, v, params) =>
      val body = params.map { case (k, sv) => s"$k=${urlEncode(sv)}" }.mkString("&")
      val envelope = jobj(Seq(
        "system_source" -> "ga", "system_version" -> "1",
        "message_id" -> msgId, "trace_id" -> s"Root=1-$msgId",
        "received_at_apig" -> ts.toString, "ip" -> v.ip,
        "user_agent" -> v.ua, "body" -> body))
      jobj(Seq(
        "recordId" -> msgId,
        "data" -> Base64.getEncoder.encodeToString(
          envelope.getBytes(StandardCharsets.UTF_8))))
    }

    val enriched = hits.map { case (msgId, ts, v, params) =>
      val bodyCols = parsedBody(params).map { case (k, sv) => s"body_$k" -> (sv: Any) }
      jobj(Seq[(String, Any)](
        "message_id" -> msgId, "trace_id" -> s"Root=1-$msgId",
        "system_source" -> "ga", "system_version" -> "1",
        "received_at_apig" -> ts.toString, "ip" -> anonIp(v.ip),
        "user_agent" -> v.ua) ++ bodyCols ++ v.device ++ v.geo)
    }

    Files.writeString(rawDir.resolve("records.jsonl"), raw.mkString("", "\n", "\n"))
    Files.writeString(enrichedDir.resolve("part-00000.jsonl"),
      enriched.mkString("", "\n", "\n"))
    // Firehose framing artifact: the first 30 records glued with no
    // newlines (the `}{` shape S6 repairs).
    Files.writeString(rawDir.resolve("concatenated.json"),
      enriched.take(30).mkString(""))

    // GeoIP range dimension (fixtures/geo/ip_ranges.csv): one /24 per
    // visitor's anonymized IP, carrying that visitor's geo block — so
    // GeoIp enrichment over the raw fixture reproduces the enriched
    // fixture's geo columns (IPv6 visitors excluded: v4-only dimension).
    val geoDir = Paths.get(s"${Paths.get(outRoot).getParent}/geo")
    Files.createDirectories(geoDir)
    val header = "start_ip,end_ip,continent,continent_code,country,country_iso," +
      "region,city,city_id,postal_code,latitude,longitude,timezone"
    val geoRows = visitors
      .filter(v => v.geo.nonEmpty && v.ip.matches("""\d+\.\d+\.\d+\.\d+"""))
      .map { v =>
        val m = v.geo.toMap
        val prefix = v.ip.split('.').take(3).mkString(".")
        Seq(s"$prefix.0", s"$prefix.255",
          m("geo_continent"), m("geo_continent_code"), m("geo_country"),
          m("geo_country_iso"), m("geo_region"), m("geo_city"),
          m("geo_city_id"), m("geo_postal_code"), m("geo_latitude"),
          m("geo_longitude"), m("geo_timezone")).mkString(",")
      }.distinct.sorted
    Files.writeString(geoDir.resolve("ip_ranges.csv"),
      (header +: geoRows).mkString("", "\n", "\n"))
    println(s"wrote ${raw.size} raw records, ${enriched.size} enriched hits, " +
      s"${geoRows.size} geo ranges under ${Paths.get(outRoot).getParent}")
  }
}
