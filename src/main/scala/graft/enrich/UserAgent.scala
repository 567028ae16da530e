package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P11 — user-agent enrichment: the 12 `device_*` columns + bot flag
  * (reference functions/enrichment/filters/user_agent.py:4-39, which wraps
  * the `user_agents` library).
  *
  * That library is not available here (zero-dependency build), so this is a
  * from-scratch regex classifier over the same public UA grammar
  * (browser/OS tokens as documented in the uap-core project's README and
  * any browser vendor's UA documentation), expressed as codegen-friendly
  * `when`/`regexp_extract` cascades — no UDF. It covers the mainstream
  * families; anything unrecognized degrades to 'Other'/'(not set)', the
  * same fallbacks the reference produces.
  *
  * Reference semantics preserved:
  *  - bot UAs yield ONLY `device_is_bot=true` (all other fields null);
  *  - `device_device_input` / `device_device_info` are always '(not set)';
  *  - tablet is not mobile (`is_mobile` == type 'mobile').
  */
object UserAgent {

  private val VerRe = "([0-9]+(?:\\.[0-9]+){0,2})"

  def isBot(ua: Column): Column =
    coalesce(ua.rlike("(?i)(bot|crawler|spider|slurp|archiver|mediapartners)"),
      lit(false))

  private def clientName(ua: Column): Column =
    when(ua.contains("Edg/") || ua.contains("Edge/"), "Edge")
      .when(ua.contains("OPR/"), "Opera")
      .when(ua.contains("Chrome/") && ua.contains("Mobile"), "Chrome Mobile")
      .when(ua.contains("Chrome/"), "Chrome")
      .when(ua.contains("Firefox/"), "Firefox")
      .when((ua.contains("iPhone") || ua.contains("iPad")) &&
        ua.contains("Safari") && ua.contains("Version/"), "Mobile Safari")
      .when(ua.contains("Safari") && ua.contains("Version/"), "Safari")
      .when(ua.contains("MSIE") || ua.contains("Trident/"), "IE")
      .otherwise("Other")

  private def clientVersion(ua: Column): Column = {
    val name = clientName(ua)
    when(name === "Edge", regexp_extract(ua, s"Edge?/$VerRe", 1))
      .when(name === "Opera", regexp_extract(ua, s"OPR/$VerRe", 1))
      .when(name === "Chrome Mobile" || name === "Chrome",
        regexp_extract(ua, s"Chrome/$VerRe", 1))
      .when(name === "Firefox", regexp_extract(ua, s"Firefox/$VerRe", 1))
      .when(name === "Mobile Safari" || name === "Safari",
        regexp_extract(ua, s"Version/$VerRe", 1))
      .when(name === "IE", regexp_extract(ua, s"(?:MSIE |rv:)$VerRe", 1))
      .otherwise("")
  }

  private def osName(ua: Column): Column =
    when(ua.contains("iPhone") || ua.contains("iPad") || ua.contains("iPod"), "iOS")
      .when(ua.contains("Android"), "Android")
      .when(ua.contains("Windows NT"), "Windows")
      .when(ua.contains("Mac OS X"), "Mac OS X")
      .when(ua.contains("Linux"), "Linux")
      .otherwise("Other")

  private def osVersion(ua: Column): Column = {
    val name = osName(ua)
    // Windows NT marketing-version mapping (public UA convention).
    val nt = regexp_extract(ua, "Windows NT ([0-9.]+)", 1)
    when(name === "iOS",
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

  private def deviceType(ua: Column): Column =
    when(ua.contains("iPad") || (ua.contains("Android") && !ua.contains("Mobile")), "tablet")
      .when(ua.contains("iPhone") || ua.contains("iPod") ||
        (ua.contains("Android") && ua.contains("Mobile")) || ua.contains("Mobi"), "mobile")
      .when(ua.contains("Windows") || ua.contains("Macintosh") ||
        ua.contains("X11") || ua.contains("Linux"), "desktop")
      .otherwise("(not set)")

  private def deviceName(ua: Column): Column =
    when(ua.contains("iPhone"), "iPhone")
      .when(ua.contains("iPad"), "iPad")
      .when(ua.contains("Android"),
        coalesce(nullif(regexp_extract(ua, "; ([^;)]+) Build", 1), lit("")),
          lit("Generic Smartphone")))
      .otherwise("Other")

  private def deviceBrand(ua: Column): Column =
    when(ua.contains("iPhone") || ua.contains("iPad"), "Apple")
      .otherwise(lit(null).cast("string"))

  private def deviceModel(ua: Column): Column =
    when(ua.contains("iPhone"), "iPhone")
      .when(ua.contains("iPad"), "iPad")
      .when(ua.contains("Android"),
        nullif(regexp_extract(ua, "; ([^;)]+) Build", 1), lit("")))
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
