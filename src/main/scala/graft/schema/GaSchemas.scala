package graft.schema

import org.apache.spark.sql.types._

/** Declared (never inferred) schemas of the GA hit pipeline.
  *
  * Field inventory reproduces the reference's static schema — 267 columns:
  * 53 GA Measurement-Protocol params (reference
  * functions/sessionization/main.py:134-188), 15 geo (main.py:190-206),
  * 12 device (main.py:208-221), 7 API-gateway envelope (main.py:223-231),
  * 160 enhanced-ecommerce `body_pr{0..19}{id,nm,br,ca,va,pr,qt,cc}`
  * (main.py:233-234), 20 custom dims/metrics `body_{cd,cm}{0..9}`
  * (main.py:236-237). Types per main.py:256-264: everything String except
  * the two device booleans and geo lat/lon doubles.
  *
  * Deliberate divergence: the reference builds the schema from a Python
  * `set` (nondeterministic column order, SURVEY §7.4); here the order is
  * fixed (group order, then declaration order) so plans and parquet
  * footprints are stable run-to-run.
  */
object GaSchemas {

  /** GA Measurement-Protocol params carried as `body_<param>`.
    * Comments give the GA meaning (main.py:134-188). */
  val gaFields: Seq[String] = Seq(
    "body_v",     // protocol version
    "body_tid",   // tracking id / web property id
    "body_aip",   // anonymize ip
    "body_ds",    // data source
    "body_cid",   // client id
    "body_uid",   // user id
    "body_dr",    // document referrer
    "body_cn",    // campaign name
    "body_cs",    // campaign source
    "body_cm",    // campaign medium
    "body_ck",    // campaign keyword
    "body_cc",    // campaign content
    "body_ci",    // campaign id
    "body_gclid", // google ads click id
    "body_dclid", // google display ads click id
    "body_sr",    // screen resolution
    "body_vp",    // viewport size
    "body_de",    // document encoding
    "body_sd",    // screen colors
    "body_ul",    // user language
    "body_je",    // java enabled
    "body_fl",    // flash version
    "body_t",     // hit type
    "body_ni",    // non-interaction hit
    "body_dl",    // document location url
    "body_dh",    // document host name
    "body_dp",    // document path
    "body_dt",    // document title
    "body_cd",    // screen name
    "body_an",    // application name
    "body_aid",   // application id
    "body_av",    // application version
    "body_aiid",  // application installer id
    "body_ec",    // event category
    "body_ea",    // event action
    "body_el",    // event label
    "body_ev",    // event value
    "body_ti",    // transaction id
    "body_ta",    // transaction affiliation
    "body_tr",    // transaction revenue
    "body_ts",    // transaction shipping
    "body_tt",    // transaction tax
    "body_in",    // item name
    "body_ip",    // item price
    "body_iq",    // item quantity
    "body_ic",    // item code
    "body_iv",    // item category
    "body_tcc",   // coupon code
    "body_pal",   // product action list
    "body_cos",   // checkout step
    "body_col",   // checkout step option
    "body_cu",    // currency code
    "body_pa")    // product action

  val geoFields: Seq[String] = Seq(
    "geo_continent", "geo_continent_code", "geo_sub_continent",
    "geo_country", "geo_country_iso", "geo_region", "geo_metro",
    "geo_city", "geo_city_id", "geo_postal_code", "geo_latitude",
    "geo_longitude", "geo_timezone", "geo_network_domain",
    "geo_network_location")

  val deviceFields: Seq[String] = Seq(
    "device_is_bot", "device_is_mobile", "device_client_name",
    "device_client_version", "device_os_name", "device_os_version",
    "device_device_type", "device_device_name", "device_device_brand",
    "device_device_model", "device_device_input", "device_device_info")

  val apiGatewayFields: Seq[String] = Seq(
    "message_id", "trace_id", "system_source", "system_version",
    "received_at_apig", "ip", "user_agent")

  /** Enhanced-ecommerce product attribute suffixes, product index 0..19. */
  val productAttrs: Seq[String] = Seq("id", "nm", "br", "ca", "va", "pr", "qt", "cc")
  val ProductSlots = 20

  val ecomFields: Seq[String] =
    for (i <- 0 until ProductSlots; a <- productAttrs) yield s"body_pr$i$a"

  val customFields: Seq[String] =
    (for (i <- 0 until 10) yield s"body_cd$i") ++
      (for (i <- 0 until 10) yield s"body_cm$i")

  val allHitFields: Seq[String] =
    apiGatewayFields ++ gaFields ++ geoFields ++ deviceFields ++
      ecomFields ++ customFields

  private def fieldType(name: String): DataType = name match {
    case "device_is_bot" | "device_is_mobile" => BooleanType
    case "geo_latitude" | "geo_longitude"     => DoubleType
    case _                                    => StringType
  }

  /** The 267-column enriched-hit input schema (S1 scan / P8 padding:
    * `spark.read.schema(hitSchema).json` null-pads ragged records, which
    * subsumes the reference's RDD `validate_fields` round-trip). */
  val hitSchema: StructType =
    StructType(allHitFields.map(f => StructField(f, fieldType(f), nullable = true)))

  require(hitSchema.size == 267, s"expected 267 hit columns, got ${hitSchema.size}")

  /** Raw Firehose envelope (VTL template, collector-ga.yaml:266-290;
    * decoded by transformation/main.py:11-19). `body` is the URL-encoded GA
    * Measurement-Protocol query string. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("system_source", StringType),
    StructField("system_version", StringType),
    StructField("message_id", StringType),
    StructField("trace_id", StringType),
    StructField("received_at_apig", StringType), // epoch millis as string
    StructField("ip", StringType),
    StructField("user_agent", StringType),
    StructField("body", StringType)))

  /** 47-column session history schema (main.py:84-132 = utils/schemas.py). */
  val sessionSchema: StructType = StructType(Seq(
    StructField("fullVisitorId", StringType),
    StructField("visitId", StringType),
    StructField("userId", StringType),
    StructField("visitNumber", IntegerType),
    StructField("visitStartTime", LongType),
    StructField("date", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("trafficSource_campaign", StringType),
    StructField("trafficSource_source", StringType),
    StructField("trafficSource_medium", StringType),
    StructField("trafficSource_keyword", StringType),
    StructField("trafficSource_ad_content", StringType),
    StructField("geoNetwork_continent", StringType),
    StructField("geoNetwork_subContinent", StringType),
    StructField("geoNetwork_country", StringType),
    StructField("geoNetwork_region", StringType),
    StructField("geoNetwork_metro", StringType),
    StructField("geoNetwork_city", StringType),
    StructField("geoNetwork_cityId", IntegerType),
    StructField("geoNetwork_networkDomain", StringType),
    StructField("geoNetwork_latitude", DoubleType),
    StructField("geoNetwork_longitude", DoubleType),
    StructField("geoNetwork_networkLocation", StringType),
    StructField("device_browser", StringType),
    StructField("device_browserVersion", DoubleType),
    StructField("device_browserSize", StringType),
    StructField("device_operatingSystem", StringType),
    StructField("device_operatingSystemVersion", StringType),
    StructField("device_isMobile", BooleanType),
    StructField("device_mobileDeviceBranding", StringType),
    StructField("device_mobileDeviceModel", StringType),
    StructField("device_mobileInputSelector", StringType),
    StructField("device_mobileDeviceInfo", StringType),
    StructField("device_mobileDeviceMarketingName", StringType),
    StructField("device_flashVersion", IntegerType),
    StructField("device_javaEnabled", StringType),
    StructField("device_language", StringType),
    StructField("device_screenColors", StringType),
    StructField("device_screenResolution", StringType),
    StructField("device_deviceCategory", StringType),
    StructField("totals_transactionRevenue", StringType),
    StructField("landingPage", StringType),
    StructField("hits_type", StringType),
    StructField("touchpoints", ArrayType(StringType)),
    StructField("touchpoints_wo_direct", ArrayType(StringType)),
    StructField("first_touchpoint", StringType),
    StructField("last_touchpoint", StringType)))

  require(sessionSchema.size == 47, s"expected 47 session columns, got ${sessionSchema.size}")
}
