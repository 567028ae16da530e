package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P11 — user-agent enrichment: the 12 `device_*` columns + bot flag
  * (reference functions/enrichment/filters/user_agent.py:4-39, which wraps
  * the `user_agents` library).
  *
  * That library is not available here (zero-dependency build), so this is a
  * from-scratch classifier over the same public UA grammar: the browser
  * family list mirrors the match order and family NAMES of the uap-core
  * project's published regex corpus (most-specific token first — in-app
  * webviews before the engines they embed, alt browsers before Chrome,
  * Chrome before Safari), expressed as codegen-friendly
  * `when`/`regexp_extract` cascades — no UDF. Beyond the mainstream
  * families this covers the high-traffic long tail: Android/iOS webviews,
  * in-app browsers (Facebook, Instagram, GSA, ...), Samsung Internet / UC /
  * QQ / Yandex / Opera Mini, smart TVs (Tizen, webOS, Fire TV, Roku,
  * Chromecast), consoles (PlayStation, Xbox, Nintendo incl. the
  * NintendoBrowser family), feature phones (KaiOS/Firefox, Symbian/Opera
  * Mini, BlackBerry 10) and the HTTP tool/SDK tail (curl, python-requests,
  * urllib, Wget, Go-http-client, okhttp, Apache-HttpClient). Anything
  * unrecognized degrades to 'Other'/'(not set)', the same fallbacks the
  * reference produces.
  *
  * Reference semantics preserved:
  *  - bot UAs yield ONLY `device_is_bot=true` (all other fields null);
  *  - `device_device_input` / `device_device_info` are always '(not set)';
  *  - tablet is not mobile (`is_mobile` == type 'mobile'); the tv/console
  *    types added for the long tail are likewise not mobile.
  */
object UserAgent {

  private val VerRe = "([0-9]+(?:\\.[0-9]+){0,2})"

  def isBot(ua: Column): Column =
    coalesce(ua.rlike(
      "(?i)(bot|crawler|spider|slurp|archiver|mediapartners|facebookexternalhit)"),
      lit(false))

  /** One browser family: (matches?, uap-core family name, version expr).
    * Order = match order; first hit wins in both name and version. */
  private type Family = (Column => Column, String, Column => Column)

  private def tok(t: String)(u: Column): Column = u.contains(t)
  private def ver(prefix: String)(u: Column): Column =
    regexp_extract(u, prefix + VerRe, 1)
  private def noVer(u: Column): Column = lit("")

  private val browserFamilies: Seq[Family] = Seq[Family](
    // ---- in-app browsers / webviews (embed Chrome or Safari tokens) ----
    ((u: Column) => tok("FBAN")(u) || tok("FBAV")(u), "Facebook", ver("FBAV/") _),
    (tok("Instagram") _, "Instagram", ver("Instagram ") _),
    (tok("GSA/") _, "GSA", ver("GSA/") _),
    ((u: Column) => tok("musical_ly")(u) || tok("TikTok")(u), "TikTok", noVer _),
    (tok("Snapchat") _, "Snapchat", ver("Snapchat/") _),
    (tok("Pinterest") _, "Pinterest", noVer _),
    (tok("Twitter") _, "Twitter", noVer _),
    (tok("Line/") _, "LINE", ver("Line/") _),
    (tok("DuckDuckGo/") _, "DuckDuckGo Mobile", ver("DuckDuckGo/") _),
    // Android WebView: Chrome UA carrying the `; wv)` marker
    ((u: Column) => tok("; wv)")(u) && tok("Chrome/")(u),
      "Chrome Mobile WebView", ver("Chrome/") _),
    // ---- automation / shells ----
    (tok("HeadlessChrome/") _, "HeadlessChrome", ver("HeadlessChrome/") _),
    (tok("Electron/") _, "Electron", ver("Electron/") _),
    // ---- HTTP tools / SDK clients (uap-core tool family names) ----
    (tok("curl/") _, "curl", ver("curl/") _),
    (tok("python-requests/") _, "Python Requests", ver("python-requests/") _),
    (tok("Python-urllib/") _, "Python-urllib", ver("Python-urllib/") _),
    (tok("Wget/") _, "Wget", ver("Wget/") _),
    (tok("Go-http-client/") _, "Go-http-client", ver("Go-http-client/") _),
    (tok("okhttp/") _, "okhttp", ver("okhttp/") _),
    (tok("Apache-HttpClient/") _, "Apache-HttpClient", ver("Apache-HttpClient/") _),
    // ---- console / feature-phone browsers ----
    (tok("NintendoBrowser/") _, "NintendoBrowser", ver("NintendoBrowser/") _),
    (tok("BB10") _, "BlackBerry WebKit", ver("Version/") _),
    // ---- alternative browsers that embed Chrome tokens ----
    (tok("SamsungBrowser/") _, "Samsung Internet", ver("SamsungBrowser/") _),
    (tok("MiuiBrowser/") _, "MiuiBrowser", ver("MiuiBrowser/") _),
    (tok("HuaweiBrowser/") _, "Huawei Browser", ver("HuaweiBrowser/") _),
    (tok("UCBrowser/") _, "UC Browser", ver("UCBrowser/") _),
    (tok("MQQBrowser/") _, "QQ Browser Mobile", ver("MQQBrowser/") _),
    (tok("QQBrowser/") _, "QQ Browser", ver("QQBrowser/") _),
    (tok("YaBrowser/") _, "Yandex Browser", ver("YaBrowser/") _),
    (tok("Vivaldi/") _, "Vivaldi", ver("Vivaldi/") _),
    (tok("Whale/") _, "Whale", ver("Whale/") _),
    (tok("coc_coc_browser/") _, "Coc Coc", ver("coc_coc_browser/") _),
    (tok("Silk/") _, "Amazon Silk", ver("Silk/") _),
    (tok("Opera Mini/") _, "Opera Mini", ver("Opera Mini/") _),
    ((u: Column) => tok("OPR/")(u) && tok("Mobi")(u), "Opera Mobile", ver("OPR/") _),
    (tok("OPR/") _, "Opera", ver("OPR/") _),
    (tok("EdgiOS/") _, "Edge Mobile", ver("EdgiOS/") _),
    (tok("EdgA/") _, "Edge Mobile", ver("EdgA/") _),
    ((u: Column) => tok("Edg/")(u) || tok("Edge/")(u), "Edge", ver("Edge?/") _),
    // ---- iOS ports (no Chrome/ token on iOS) ----
    (tok("CriOS/") _, "Chrome Mobile iOS", ver("CriOS/") _),
    (tok("FxiOS/") _, "Firefox iOS", ver("FxiOS/") _),
    // ---- mainstream ----
    ((u: Column) => tok("Chrome/")(u) && tok("Mobile")(u), "Chrome Mobile", ver("Chrome/") _),
    (tok("Chrome/") _, "Chrome", ver("Chrome/") _),
    ((u: Column) => tok("Firefox/")(u) &&
      (tok("Android")(u) || tok("Mobile")(u) || tok("Tablet")(u)),
      "Firefox Mobile", ver("Firefox/") _),
    (tok("Firefox/") _, "Firefox", ver("Firefox/") _),
    (tok("Konqueror/") _, "Konqueror", ver("Konqueror/") _),
    ((u: Column) => (tok("iPhone")(u) || tok("iPad")(u)) &&
      tok("Safari")(u) && tok("Version/")(u), "Mobile Safari", ver("Version/") _),
    // iOS in-app webview: WebKit + Mobile/ build tag, no Safari token
    ((u: Column) => (tok("iPhone")(u) || tok("iPad")(u) || tok("iPod")(u)) &&
      tok("Mobile/")(u) && !tok("Safari")(u),
      "Mobile Safari UI/WKWebView", noVer _),
    ((u: Column) => tok("Safari")(u) && tok("Version/")(u), "Safari", ver("Version/") _),
    ((u: Column) => tok("MSIE")(u) || tok("Trident/")(u), "IE",
      (u: Column) => regexp_extract(u, s"(?:MSIE |rv:)$VerRe", 1)))

  private def clientName(ua: Column): Column =
    browserFamilies.foldLeft(Option.empty[Column]) {
      case (acc, (p, n, _)) =>
        Some(acc.fold(when(p(ua), n))(_.when(p(ua), n)))
    }.get.otherwise("Other")

  private def clientVersion(ua: Column): Column =
    browserFamilies.foldLeft(Option.empty[Column]) {
      case (acc, (p, _, v)) =>
        Some(acc.fold(when(p(ua), v(ua)))(_.when(p(ua), v(ua))))
    }.get.otherwise("")

  private def osName(ua: Column): Column =
    when(ua.contains("Windows Phone"), "Windows Phone")
      .when(ua.contains("KAIOS/"), "KaiOS")
      .when(ua.contains("SymbOS") || ua.contains("Symbian"), "Symbian OS")
      .when(ua.contains("BB10") || ua.contains("BlackBerry"), "BlackBerry OS")
      .when(ua.contains("CrOS"), "Chrome OS")
      .when(ua.contains("Tizen"), "Tizen")
      .when(ua.contains("Web0S") || ua.contains("webOS"), "webOS")
      .when(ua.contains("Apple TV") || ua.contains("AppleTV"), "tvOS")
      .when(ua.contains("PlayStation"), "PlayStation")
      .when(ua.contains("Nintendo"), "Nintendo")
      .when(ua.contains("Roku"), "Roku")
      .when(ua.contains("iPhone") || ua.contains("iPad") || ua.contains("iPod"), "iOS")
      .when(ua.contains("Android"), "Android")
      .when(ua.contains("Windows NT"), "Windows")
      .when(ua.contains("Mac OS X"), "Mac OS X")
      .when(ua.contains("Linux"), "Linux")
      .otherwise("Other")

  private def osVersion(ua: Column): Column = {
    val name = osName(ua)
    // Windows NT marketing-version mapping (public UA convention).
    val nt = regexp_extract(ua, "Windows NT ([0-9.]+)", 1)
    when(name === "Windows Phone",
      regexp_extract(ua, s"Windows Phone (?:OS )?$VerRe", 1))
      .when(name === "KaiOS", regexp_extract(ua, s"KAIOS/$VerRe", 1))
      .when(name === "BlackBerry OS", regexp_extract(ua, s"Version/$VerRe", 1))
      .when(name === "Chrome OS", regexp_extract(ua, s"CrOS [^ )]+ $VerRe", 1))
      .when(name === "Tizen", regexp_extract(ua, s"Tizen ?$VerRe", 1))
      .when(name === "webOS", regexp_extract(ua, s"webOS[/ ]$VerRe", 1))
      .when(name === "PlayStation",
        // both public forms: 'PlayStation 4 8.03' and 'PlayStation 5/2.26'
        regexp_extract(ua, s"PlayStation (?:\\d+|Vita)[/ ]$VerRe", 1))
      .when(name === "Roku", regexp_extract(ua, s"Roku/DVP-$VerRe", 1))
      .when(name === "iOS",
        regexp_replace(regexp_extract(ua, "OS ([0-9_]+)", 1), "_", "."))
      .when(name === "Android", regexp_extract(ua, s"Android $VerRe", 1))
      .when(name === "Windows",
        when(nt === "10.0", "10").when(nt === "6.3", "8.1")
          .when(nt === "6.2", "8").when(nt === "6.1", "7")
          .when(nt === "6.0", "Vista").when(nt === "5.1", "XP")
          .otherwise(nt))
      .when(name === "Mac OS X",
        regexp_replace(regexp_extract(ua, "Mac OS X ([0-9_.]+)", 1), "_", "."))
      .otherwise("")
  }

  private def isConsole(ua: Column): Column =
    ua.contains("PlayStation") || ua.contains("Xbox") || ua.contains("Nintendo")

  private def isTv(ua: Column): Column =
    ua.contains("SMART-TV") || ua.contains("SmartTV") ||
      ua.contains("Apple TV") || ua.contains("AppleTV") ||
      ua.contains("CrKey") || ua.contains("BRAVIA") || ua.contains("Roku") ||
      ua.rlike("AFT[A-Z]") || ua.contains("Web0S") ||
      (ua.contains("webOS") && !ua.contains("Mobi")) ||
      ua.contains("HbbTV") || ua.contains("NetCast") ||
      ua.contains("Android TV") || ua.contains("GoogleTV") ||
      ua.contains("VIDAA") || (ua.contains("Tizen") && !ua.contains("Mobi"))

  private def deviceType(ua: Column): Column =
    when(isConsole(ua), "console")
      .when(isTv(ua), "tv")
      .when(ua.contains("iPad") || (ua.contains("Android") && !ua.contains("Mobile")), "tablet")
      .when(ua.contains("iPhone") || ua.contains("iPod") ||
        (ua.contains("Android") && ua.contains("Mobile")) || ua.contains("Mobi"), "mobile")
      .when(ua.contains("Windows") || ua.contains("Macintosh") ||
        ua.contains("X11") || ua.contains("Linux") || ua.contains("CrOS"), "desktop")
      .otherwise("(not set)")

  /** Android hardware token: the classic `; <model> Build` form, falling
    * back to the modern Chrome form that drops `Build` (`; <model>)`). */
  private def androidModel(ua: Column): Column =
    coalesce(
      nullif(regexp_extract(ua, "; ([^;)]+) Build", 1), lit("")),
      nullif(regexp_extract(ua, "Android [0-9.]+; ([^;)]+)\\)", 1), lit("")))

  private def deviceName(ua: Column): Column =
    when(ua.contains("iPhone"), "iPhone")
      .when(ua.contains("iPad"), "iPad")
      .when(ua.contains("iPod"), "iPod touch")
      .when(ua.contains("Apple TV") || ua.contains("AppleTV"), "Apple TV")
      .when(ua.contains("CrKey"), "Chromecast")
      .when(ua.rlike("AFT[A-Z]"), "Fire TV")
      .when(ua.contains("Roku"), "Roku")
      .when(ua.contains("PlayStation"), "PlayStation")
      .when(ua.contains("Xbox"), "Xbox")
      .when(ua.contains("Nintendo Switch"), "Nintendo Switch")
      .when(ua.contains("Android"),
        coalesce(androidModel(ua), lit("Generic Smartphone")))
      .otherwise("Other")

  private def deviceBrand(ua: Column): Column =
    when(ua.contains("iPhone") || ua.contains("iPad") || ua.contains("iPod") ||
      ua.contains("Apple TV") || ua.contains("AppleTV"), "Apple")
      .when(ua.contains("SM-") || ua.contains("GT-") ||
        ua.contains("SAMSUNG") || ua.contains("SMART-TV"), "Samsung")
      .when(ua.contains("Pixel"), "Google")
      .when(ua.contains("CrKey"), "Google")
      .when(ua.contains("Redmi") || ua.contains("; Mi ") ||
        ua.contains("POCO") || ua.contains("XiaoMi"), "XiaoMi")
      .when(ua.contains("HUAWEI") || ua.contains("HONOR"), "Huawei")
      .when(ua.contains("ONEPLUS"), "OnePlus")
      .when(ua.rlike("CPH[0-9]{4}"), "Oppo")
      .when(ua.contains("vivo "), "Vivo")
      .when(ua.contains("moto ") || ua.contains("Moto "), "Motorola")
      .when(ua.contains("Nokia"), "Nokia")
      .when(ua.contains("LG-") || ua.contains("NetCast"), "LG")
      .when(ua.contains("Xperia") || ua.contains("BRAVIA") ||
        ua.contains("PlayStation"), "Sony")
      .when(ua.contains("Xbox"), "Microsoft")
      .when(ua.contains("Nintendo"), "Nintendo")
      .when(ua.contains("Kindle") || ua.rlike("KF[A-Z]{2}") ||
        ua.rlike("AFT[A-Z]") || ua.contains("Silk/"), "Amazon")
      .when(ua.contains("Roku"), "Roku")
      .when(ua.contains("BB10") || ua.contains("BlackBerry"), "BlackBerry")
      .otherwise(lit(null).cast("string"))

  private def deviceModel(ua: Column): Column =
    when(ua.contains("iPhone"), "iPhone")
      .when(ua.contains("iPad"), "iPad")
      .when(ua.contains("iPod"), "iPod touch")
      .when(ua.contains("Apple TV") || ua.contains("AppleTV"), "Apple TV")
      .when(ua.contains("Android"), androidModel(ua))
      .otherwise(lit(null).cast("string"))

  /** Adds the 12 `device_*` columns. Bot rows carry only the flag. One
    * withColumns batch — a 12-deep withColumn chain re-analyzes the
    * ~270-col ingest plan 12 times. */
  def withDeviceColumns(df: DataFrame, ua: Column): DataFrame = {
    val bot = isBot(ua)
    def nonBot(c: Column): Column = when(!bot, c) // null on bot rows
    df.withColumns(Map(
      "device_is_bot" -> bot,
      "device_is_mobile" -> nonBot(deviceType(ua) === "mobile"),
      "device_client_name" -> nonBot(clientName(ua)),
      "device_client_version" -> nonBot(clientVersion(ua)),
      "device_os_name" -> nonBot(osName(ua)),
      "device_os_version" -> nonBot(osVersion(ua)),
      "device_device_type" -> nonBot(deviceType(ua)),
      "device_device_name" -> nonBot(deviceName(ua)),
      "device_device_brand" -> nonBot(deviceBrand(ua)),
      "device_device_model" -> nonBot(deviceModel(ua)),
      "device_device_input" -> nonBot(lit("(not set)")),
      "device_device_info" -> nonBot(lit("(not set)"))))
  }
}
