package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Traffic-source attribution (F2–F10) — the reference's Python UDF cascade
  * (functions/sessionization/main.py:330-717) re-expressed branch-for-branch
  * as pure Catalyst expression trees (`parse_url` + `when` cascades), so the
  * whole surface stays inside whole-stage codegen.
  *
  * Faithfulness notes (each verified by AttributionSpec's decision table):
  *  - `split_query` (main.py:489-497) does NOT url-decode, KEEPS blank
  *    values, and requires '=' at index >= 1; duplicate keys last-win.
  *  - `identify_channel` (main.py:499-514) matches channel names as
  *    SUBSTRINGS of query keys, in query order, then dispatches on the
  *    first matching key by EXACT equality.
  *  - `split_hostname` (main.py:519-533): 'www' anywhere → label[1];
  *    3 labels → label[1]; 2 labels → label[0]; else whole netloc.
  *  - `parse_dr_medium` (main.py:628-645) extracts the referrer "hostname"
  *    as label[1] of the host — so `googleadservices.com` (no www) yields
  *    'com', NOT 'googleadservices': source says google but medium falls to
  *    referral. Quirk preserved.
  *  - Reference UDFs crash on null `body_dl` (urlparse(None)); we define
  *    null ≡ '' (empty query → the 'direct=(direct)' sentinel of
  *    main.py:479-483). Documented divergence that un-crashes app hits.
  */
object Attribution {

  val Channels: Seq[String] =
    Seq("utm_source", "gclid", "gclsrc", "dclid", "fbclid", "mscklid", "direct")
  val SearchEngines: Seq[String] =
    Seq("google", "yahoo", "bing", "aol", "ask", "comcast", "nexttag", "local")
  val PaidChannels: Seq[String] =
    Seq("gclid", "gclsrc", "dclid", "fbclid", "mscklid")

  // ------------------------------------------------------- URL dissection
  // Python's urlparse is purely syntactic (scheme://netloc/path?query#frag)
  // and accepts raw spaces etc.; Spark's parse_url is ANSI-strict and throws
  // on such URLs (try_parse_url nulls the whole value, losing the query).
  // Regexp dissection reproduces urlparse exactly and stays codegen'd.
  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:"

  /** Raw query string of a URL; null/absent → '' (Python urlparse parity). */
  def rawQuery(url: Column): Column =
    coalesce(regexp_extract(url, "\\?([^#]*)", 1), lit(""))

  /** URL path; null/absent → '' (urlparse('').path == ''). */
  def pagePath(url: Column): Column =
    coalesce(regexp_extract(url, s"($SchemeRe)?(//[^/?#]*)?([^?#]*)", 3), lit(""))

  /** URL netloc; null/absent → ''. */
  def hostname(url: Column): Column =
    coalesce(regexp_extract(url, s"$SchemeRe//([^/?#]*)", 1), lit(""))

  /** `split_query` over a raw query string → map<string,string>.
    * Keeps blank values, no decoding, '=' must be at index >= 1, duplicate
    * keys last-win (needs spark.sql.mapKeyDedupPolicy=LAST_WIN). */
  def splitQuery(qs: Column): Column = {
    val valid = filter(split(qs, "&"), x => instr(x, "=") >= 2)
    map_from_arrays(
      transform(valid, x => substring_index(x, "=", 1)),
      transform(valid, x => expr_substr_after_eq(x)))
  }

  private def expr_substr_after_eq(x: Column): Column =
    x.substr(instr(x, "=") + 1, length(x))

  /** The 'direct=(direct)' sentinel map used when a query is empty
    * (main.py:479-483). */
  private val sentinel: Column = map(lit("direct"), lit("(direct)"))

  /** `identify_channel(channels, qr)` (main.py:499-514): first query key
    * (in order) containing any channel name as a substring, dispatched by
    * exact equality. */
  def identifyChannel(qm: Column): Column = {
    val matching = filter(map_keys(qm),
      k => Channels.map(c => k.contains(c)).reduce(_ || _))
    val first = try_element_at(matching, lit(1)) // null when no match
    when(first.isNull, "(direct)")
      .when(first === "gclid" || first === "gclsrc" || first === "dclid", "google")
      .when(first === "fbclid", "facebook")
      .when(first === "mscklid", "bing")
      .when(first === "utm_source", element_at(qm, "utm_source"))
      .when(first === "direct", "(direct)")
      .otherwise("(not set)")
  }

  /** `split_hostname` (main.py:519-533). */
  def splitHostname(dr: Column): Column = {
    val host = hostname(dr)
    val labels = split(host, "\\.")
    when(array_contains(labels, "www"), try_element_at(labels, lit(2)))
      .when(size(labels) === 3, try_element_at(labels, lit(2)))
      .when(size(labels) === 2, try_element_at(labels, lit(1)))
      .otherwise(host)
  }

  /** `parse_dr_medium`'s quirky hostname: label[1] of
    * `dr.split('//')[-1].split('/')[0]` — null when fewer than 2 labels
    * (the reference raises IndexError there). */
  def drMediumHost(dr: Column): Column =
    try_element_at(split(try_element_at(split(try_element_at(split(dr, "//"), lit(-1)), "/"), lit(1)), "\\."), lit(2))

  // ---------------------------------------------------------- F3: source
  def source(isNew: Column, dl: Column, dr: Column): Column = {
    val dlQ = rawQuery(dl)
    val dlEmpty = length(dlQ) === 0
    val dlMap = splitQuery(dlQ)
    val dlMapS = when(dlEmpty, sentinel).otherwise(dlMap)
    val drEmpty = length(rawQuery(dr)) === 0
    val host = splitHostname(dr)

    val parseDlSource = identifyChannel(dlMapS)

    val parseDrSource =
      when(dr.startsWith("android-app"), try_element_at(split(dr, "//"), lit(2)))
        .when(host === "googleadservices", "google")
        .when(dlEmpty && drEmpty, host)
        .when(!dlEmpty && map_contains_key(dlMap, "utm_source"),
          element_at(dlMap, "utm_source"))
        .when(!drEmpty, host)
        .when(!dlEmpty && map_contains_key(dlMap, "ref"), element_at(dlMap, "ref"))
        .when(!dlEmpty, identifyChannel(dlMap))
        .otherwise("(not set)")

    when(isNew === 1 && dr.isNull, parseDlSource)
      .when(isNew === 1 && dr.isNotNull, parseDrSource)
      .otherwise("(not set)")
  }

  // -------------------------------------------------------- F4: campaign
  /** Both referrer branches reduce to utm_campaign-from-dl (main.py:570-592). */
  def campaign(isNew: Column, dl: Column): Column = {
    val dlMap = splitQuery(rawQuery(dl))
    when(isNew === 1 && map_contains_key(dlMap, "utm_campaign"),
      element_at(dlMap, "utm_campaign"))
      .otherwise("(not set)")
  }

  // ---------------------------------------------------------- F5: medium
  def medium(isNew: Column, dl: Column, dr: Column): Column = {
    val dlQ = rawQuery(dl)
    val dlEmpty = length(dlQ) === 0
    val dlMap = splitQuery(dlQ)
    val mHost = drMediumHost(dr)

    val identifyMedium = // dr-null branch; the sentinel carries no keys
      when(!dlEmpty && map_contains_key(dlMap, "utm_medium"),
        element_at(dlMap, "utm_medium"))
        .when(!dlEmpty && map_contains_key(dlMap, "gclid"), "paid")
        .otherwise("(none)")

    val inEngines = SearchEngines.map(mHost === _).reduce(_ || _)
    val anyPaidKey = PaidChannels.map(k => map_contains_key(dlMap, k)).reduce(_ || _)

    val parseDrMedium =
      when(mHost === "googleadservices", "paid")
        .when(dlEmpty && inEngines, "organic")
        .when((dlEmpty && !coalesce(inEngines, lit(false))) ||
          (!dlEmpty && map_contains_key(dlMap, "ref")), "referral")
        .when(!dlEmpty && anyPaidKey, "paid")
        .when(!dlEmpty && map_contains_key(dlMap, "utm_medium"),
          element_at(dlMap, "utm_medium"))
        .otherwise("(none)")

    when(isNew === 1 && dr.isNull, identifyMedium)
      .when(isNew === 1 && dr.isNotNull, parseDrMedium)
      .otherwise("(none)")
  }

  // --------------------------------------------------------- F6: keyword
  def keyword(isNew: Column, dl: Column, dr: Column, medium: Column): Column = {
    val dlMap = splitQuery(rawQuery(dl))
    when(medium === "organic", "(not provided)")
      .when(isNew === 1 && dr.isNull,
        when(map_contains_key(dlMap, "utm_term"), element_at(dlMap, "utm_term"))
          .otherwise("(not set)"))
      .otherwise("(not set)")
  }

  // ------------------------------------------------------ F7: ad content
  def adContent(isNew: Column, dl: Column, dr: Column): Column = {
    val dlMap = splitQuery(rawQuery(dl))
    when(isNew === 1 && dr.isNull,
      when(map_contains_key(dlMap, "utm_content"), element_at(dlMap, "utm_content"))
        .otherwise("(not set)"))
      .otherwise("(not set)")
  }

  // ----------------------------------------------------- F8: true direct
  def isTrueDirect(source: Column): Column =
    when(source === "(direct)", "True").otherwise(lit(null).cast("string"))

  // ---------------------------------------------------- F9: landing page
  def landingPage(isNew: Column, dl: Column): Column =
    when(isNew === 1, pagePath(dl)).otherwise(lit(null).cast("string"))

  // ------------------------------------------- F2: page path levels 1..4
  /** `parse_page_path` + `construct_levels` (main.py:347-376): non-empty
    * path segments; level i = '/'+segment_i when present else ''. */
  def pagePathLevels(dl: Column): Seq[Column] = {
    val parts = filter(split(pagePath(dl), "/"), x => x =!= "")
    (0 until 4).map { i =>
      when(size(parts) > i, concat(lit("/"), try_element_at(parts, lit(i + 1))))
        .otherwise("").as(s"page_path_level_${i + 1}")
    }
  }
}
