package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Attribution, Ecommerce, Sessionization}
import graft.ingest.Ingest
import graft.functions.GaFunctions

/** One third of the DuckDB oracle registry (split from SparkEntry,
  * round-12 verdict — pure move): oracle SQL for queries q01-q99. The
  * shared DuckDB CTE helpers stay in [[SparkEntry]]. */
private[graft] object Oracle1to99 {
  import SparkEntry._

  val m: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05""".stripMargin,

    "q03_join_revenue_nation" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,

    "q06_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q07_window_lag_gap" ->
      """SELECT event_id, user_id,
        |  ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap_ms,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS rn
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events) e""".stripMargin,

    "q08_sessionize" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ms,
        |    ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
        |  FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events) e)
        |SELECT event_id, user_id,
        |  CASE WHEN gap IS NULL OR gap >= 1800000 THEN 1 ELSE 0 END AS is_new_session,
        |  CAST(SUM(CASE WHEN gap IS NULL OR gap >= 1800000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM g""".stripMargin,

    "q09_sessions_per_user" ->
      """WITH g AS (
        |  SELECT user_id, ms,
        |    ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
        |  FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events) e)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap IS NULL OR gap >= 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "q10_touchpoints" ->
      s"""SELECT user_id,
        |  array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, $MaxTouchpoints), '>') AS path,
        |  first(event_type ORDER BY ts, event_id) AS first_touch,
        |  last(event_type ORDER BY ts, event_id) AS last_touch,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,

    "q11_session_table" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
        |g AS (
        |  SELECT user_id, event_id, ms,
        |    ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
        |  FROM e),
        |s AS (
        |  SELECT user_id, ms,
        |    SUM(CASE WHEN gap IS NULL OR gap >= 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM g)
        |SELECT user_id, CAST(seq AS BIGINT) AS session_seq,
        |  MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms,
        |  COUNT(*) AS session_hits,
        |  md5(user_id::VARCHAR || MIN(ms)::VARCHAR || MAX(ms)::VARCHAR) AS session_id
        |FROM s GROUP BY user_id, seq""".stripMargin,

    "q12_ga_ingest" ->
      s"""WITH raw AS (
        |  SELECT decode(from_base64(data)) AS env
        |  FROM read_json('$GaRaw', format='newline_delimited',
        |                 columns={recordId:'VARCHAR', data:'VARCHAR'})),
        |e AS (
        |  SELECT json_extract_string(env,'$$.message_id') AS message_id,
        |         json_extract_string(env,'$$.ip') AS ip0,
        |         json_extract_string(env,'$$.received_at_apig') AS received_at_apig,
        |         json_extract_string(env,'$$.body') AS body
        |  FROM raw)
        |SELECT message_id,
        |  CASE WHEN strpos(ip0,'.') >= 2
        |         THEN array_to_string(list_slice(string_split(ip0,'.'),1,3),'.') || '.0'
        |       WHEN strpos(ip0,':') >= 2
        |         THEN array_to_string(list_slice(string_split(ip0,':'),1,3),':') || ':0000:0000:0000:0000:0000'
        |       ELSE '0.0.0.0' END AS ip,
        |  received_at_apig,
        |  NULLIF(regexp_extract(body, '(?:^|&)t=([^&]*)', 1), '') AS body_t,
        |  NULLIF(regexp_extract(body, '(?:^|&)cid=([^&]*)', 1), '') AS body_cid,
        |  NULLIF(regexp_extract(body, '(?:^|&)tid=([^&]*)', 1), '') AS body_tid
        |FROM e""".stripMargin,

    "q13_ga_hits_type" ->
      s"""SELECT CASE body_t
        |    WHEN 'pageview' THEN 'PAGE'
        |    WHEN 'screenview' THEN 'APPVIEW'
        |    WHEN 'event' THEN 'EVENT'
        |    WHEN 'transaction' THEN 'TRANSACTION'
        |    WHEN 'item' THEN 'ITEM'
        |    WHEN 'social' THEN 'SOCIAL'
        |    WHEN 'exception' THEN 'EXCEPTION'
        |    WHEN 'timing' THEN 'TIMING'
        |    ELSE 'UNKNOWN' END AS hits_type,
        |  COUNT(*) AS n_hits,
        |  COUNT(DISTINCT body_cid) AS n_visitors
        |FROM read_json('$GaEnrichedFile', format='newline_delimited',
        |               columns={body_t:'VARCHAR', body_cid:'VARCHAR'})
        |GROUP BY 1""".stripMargin,

    "q14_ga_attribution" ->
      s"""WITH ${dGaSessionCtes("")},
        |st AS (SELECT * FROM s WHERE is_new = 1),
        |${dUrlCtes("st")},
        |a AS (
        |  SELECT $dSourceCase AS traffic_source,
        |         $dMediumCase AS traffic_medium,
        |         $dCampaignCase AS traffic_campaign
        |  FROM u2)
        |SELECT traffic_source, traffic_medium, traffic_campaign,
        |  CASE WHEN traffic_source = '(direct)' THEN 'True' END AS is_true_direct,
        |  COUNT(*) AS n_sessions
        |FROM a GROUP BY 1, 2, 3, 4""".stripMargin,

    "q15_ga_products" -> {
      // Generated UNPIVOT: one UNION ALL branch per product slot 0..19.
      val attrCols = (0 until 20).flatMap(i =>
        Seq("id", "br", "pr", "qt").map(a => s"body_pr$i$a:'VARCHAR'")).mkString(", ")
      val branches = (0 until 20).map(i =>
        s"SELECT body_pa, body_pr${i}id AS prid, body_pr${i}br AS prbr, " +
          s"body_pr${i}pr AS prpr, body_pr${i}qt AS prqt FROM h")
        .mkString("\n  UNION ALL ")
      s"""WITH h AS (
        |  SELECT * FROM read_json('$GaEnrichedFile', format='newline_delimited',
        |       columns={body_pa:'VARCHAR', $attrCols})),
        |p AS (
        |  $branches)
        |SELECT prid, prbr, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(prqt AS BIGINT)) AS BIGINT) AS total_qty,
        |  CAST(ROUND(SUM(CASE WHEN body_pa = 'purchase'
        |    THEN CAST(prqt AS DECIMAL(18,6)) * CAST(prpr AS DECIMAL(18,6)) END), 2) AS DOUBLE)
        |    AS purchase_revenue
        |FROM p WHERE prid IS NOT NULL
        |GROUP BY 1, 2""".stripMargin
    },

    "q16_ga_sessions" ->
      s"""WITH ${dGaSessionCtes(", body_pa:'VARCHAR', body_tr:'VARCHAR'")},
        |v AS (
        |  SELECT *, MIN(ms) OVER wv AS first_value, MAX(ms) OVER wv AS last_value,
        |    SUM(CASE WHEN body_t = 'event' AND body_pa = 'purchase'
        |        THEN CAST(body_tr AS DECIMAL(18,6)) END) OVER wv AS rev
        |  FROM s WINDOW wv AS (PARTITION BY body_cid, seq)),
        |st AS (SELECT * FROM v WHERE is_new = 1),
        |${dUrlCtes("st")},
        |p AS (
        |  SELECT body_cid AS fullVisitorId,
        |    md5(body_cid || first_value::VARCHAR || last_value::VARCHAR) AS visitId,
        |    CAST(seq AS BIGINT) AS visitNumber,
        |    first_value AS visitStartTime,
        |    CAST(strftime(make_timestamp((ms // 1000) * 1000000), '%Y%m%d') AS BIGINT) AS "date",
        |    ms,
        |    $dSourceCase AS trafficSource_source,
        |    $dMediumCase AS trafficSource_medium,
        |    $dCampaignCase AS trafficSource_campaign,
        |    CAST(CAST(rev AS DOUBLE) AS VARCHAR) AS totals_transactionRevenue,
        |    ${dPath("body_dl")} AS landingPage
        |  FROM u2
        |  WHERE strftime(make_timestamp((ms // 1000) * 1000000), '%Y-%m-%d') = '2019-09-23'),
        |tp AS (
        |  SELECT fullVisitorId,
        |    list(trafficSource_source ORDER BY ms, visitId) AS touchpoints,
        |    first(trafficSource_source ORDER BY ms, visitId) AS first_touchpoint
        |  FROM p GROUP BY 1)
        |SELECT p.fullVisitorId, visitId, visitNumber, visitStartTime, "date",
        |  trafficSource_source, trafficSource_medium, trafficSource_campaign,
        |  totals_transactionRevenue, landingPage,
        |  array_to_string(touchpoints, chr(1)) AS touchpoints,
        |  COALESCE(array_to_string(list_filter(touchpoints, x -> x <> '(direct)'), chr(1)), '') AS touchpoints_wo_direct,
        |  first_touchpoint,
        |  COALESCE(list_filter(touchpoints, x -> x <> '(direct)')[-1], '(direct)') AS last_touchpoint
        |FROM p JOIN tp ON p.fullVisitorId = tp.fullVisitorId""".stripMargin,

    // Incremental-touchpoints mirror: the q16 pipeline WITHOUT the
    // job-date filter (touched visitors' paths accumulate across days —
    // v17's morning session must carry the night session's source), plus
    // the ghost history row passed through VERBATIM with its sentinel
    // touchpoints (the anti-join contract; a recompute would overwrite
    // them and hash-fail).
    "q59_ga_touchpoints_incremental" ->
      s"""WITH ${dGaSessionCtes(", body_pa:'VARCHAR', body_tr:'VARCHAR'")},
        |v AS (
        |  SELECT *, MIN(ms) OVER wv AS first_value, MAX(ms) OVER wv AS last_value,
        |    SUM(CASE WHEN body_t = 'event' AND body_pa = 'purchase'
        |        THEN CAST(body_tr AS DECIMAL(18,6)) END) OVER wv AS rev
        |  FROM s WINDOW wv AS (PARTITION BY body_cid, seq)),
        |st AS (SELECT * FROM v WHERE is_new = 1),
        |${dUrlCtes("st")},
        |p AS (
        |  SELECT body_cid AS fullVisitorId,
        |    md5(body_cid || first_value::VARCHAR || last_value::VARCHAR) AS visitId,
        |    CAST(seq AS BIGINT) AS visitNumber,
        |    first_value AS visitStartTime,
        |    CAST(strftime(make_timestamp((ms // 1000) * 1000000), '%Y%m%d') AS BIGINT) AS "date",
        |    ms,
        |    $dSourceCase AS trafficSource_source,
        |    $dMediumCase AS trafficSource_medium,
        |    $dCampaignCase AS trafficSource_campaign,
        |    CAST(CAST(rev AS DOUBLE) AS VARCHAR) AS totals_transactionRevenue,
        |    ${dPath("body_dl")} AS landingPage
        |  FROM u2),
        |tp AS (
        |  SELECT fullVisitorId,
        |    list(trafficSource_source ORDER BY ms, visitId) AS touchpoints,
        |    first(trafficSource_source ORDER BY ms, visitId) AS first_touchpoint
        |  FROM p GROUP BY 1)
        |SELECT p.fullVisitorId, visitId, visitNumber, visitStartTime, "date",
        |  trafficSource_source, trafficSource_medium, trafficSource_campaign,
        |  totals_transactionRevenue, landingPage,
        |  array_to_string(touchpoints, chr(1)) AS touchpoints,
        |  COALESCE(array_to_string(list_filter(touchpoints, x -> x <> '(direct)'), chr(1)), '') AS touchpoints_wo_direct,
        |  first_touchpoint,
        |  COALESCE(list_filter(touchpoints, x -> x <> '(direct)')[-1], '(direct)') AS last_touchpoint
        |FROM p JOIN tp ON p.fullVisitorId = tp.fullVisitorId
        |UNION ALL
        |SELECT 'ghost-visitor', visitId, visitNumber, visitStartTime, "date",
        |  trafficSource_source, trafficSource_medium, trafficSource_campaign,
        |  totals_transactionRevenue, landingPage,
        |  'stored-v1', 'stored-v1', 'stored-v1', 'stored-v1'
        |FROM p WHERE "date" = 20190922""".stripMargin,

    "q17_ga_pageviews" ->
      s"""WITH ${dGaSessionCtes("")},
        |v AS (
        |  SELECT *, MIN(ms) OVER wv AS first_value, MAX(ms) OVER wv AS last_value,
        |    ROW_NUMBER() OVER (PARTITION BY body_cid ORDER BY ms, message_id) AS evseq
        |  FROM s WINDOW wv AS (PARTITION BY body_cid, seq)),
        |pv AS (SELECT * FROM v WHERE body_t = 'pageview'),
        |lv AS (
        |  SELECT *, list_filter(string_split(${dPath("body_dl")}, '/'), x -> x <> '') AS parts
        |  FROM pv)
        |SELECT body_cid AS fullVisitorId,
        |  md5(body_cid || first_value::VARCHAR || last_value::VARCHAR) AS visitId,
        |  message_id AS requestId,
        |  first_value AS visitStartTime,
        |  CAST(evseq AS BIGINT) AS hits_hitNumber,
        |  CAST(EXTRACT(hour FROM make_timestamp((ms // 1000) * 1000000)) AS BIGINT) AS hits_hour,
        |  CAST(EXTRACT(minute FROM make_timestamp((ms // 1000) * 1000000)) AS BIGINT) AS hits_minute,
        |  ${dPath("body_dl")} AS hits_page_pagePath,
        |  CASE WHEN body_dl IS NULL THEN ''
        |       ELSE coalesce(regexp_extract(body_dl, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1), '') END AS hits_page_hostname,
        |  CASE WHEN len(parts) >= 1 THEN '/' || parts[1] ELSE '' END AS hits_page_pagePathLevel1,
        |  CASE WHEN len(parts) >= 2 THEN '/' || parts[2] ELSE '' END AS hits_page_pagePathLevel2,
        |  CASE WHEN len(parts) >= 3 THEN '/' || parts[3] ELSE '' END AS hits_page_pagePathLevel3,
        |  CASE WHEN len(parts) >= 4 THEN '/' || parts[4] ELSE '' END AS hits_page_pagePathLevel4,
        |  'PAGE' AS hits_type
        |FROM lv""".stripMargin,

    // EVENT rows whose exploded product SKU is null: the no-slot row
    // explode_outer emits, plus any populated slot missing its id.
    "q45_ga_hits_events" -> {
      val noSlots = (0 until graft.schema.GaSchemas.ProductSlots)
        .map(dSlotPresent).mkString("NOT (", " OR ", ")")
      val idNullBranches = (0 until graft.schema.GaSchemas.ProductSlots)
        .map(i => s"SELECT * FROM v WHERE body_t = 'event' AND ${dSlotPresent(i)} AND body_pr${i}id IS NULL")
        .mkString("\n  UNION ALL ")
      s"""WITH ${dGaSessionCtes(
           ", body_pa:'VARCHAR', body_tr:'VARCHAR', body_ec:'VARCHAR', " +
           s"body_ea:'VARCHAR', body_el:'VARCHAR', body_ev:'VARCHAR', $dProductColDecls")},
        |$dHitV,
        |ve AS (
        |  SELECT * FROM v WHERE body_t = 'event' AND $noSlots
        |  UNION ALL $idNullBranches)
        |SELECT $dHitHead,
        |  CAST(EXTRACT(hour FROM make_timestamp((ms // 1000) * 1000000)) AS BIGINT) AS hits_hour,
        |  CAST(EXTRACT(minute FROM make_timestamp((ms // 1000) * 1000000)) AS BIGINT) AS hits_minute,
        |  COALESCE(body_ec, '') AS hits_eventInfo_eventCategory,
        |  COALESCE(body_ea, '') AS hits_eventInfo_eventAction,
        |  COALESCE(body_el, '') AS hits_eventInfo_eventLabel,
        |  COALESCE(body_ev, '') AS hits_eventInfo_eventValue,
        |  'EVENT' AS hits_type
        |FROM ve""".stripMargin
    },

    // One row per (EVENT hit, populated slot) with a non-empty SKU —
    // the UNION ALL mirrors the explode over the 20 slots.
    "q46_ga_hits_products" -> {
      val branches = (0 until graft.schema.GaSchemas.ProductSlots)
        .map(i => s"SELECT *, body_pr${i}id AS prid, body_pr${i}br AS prbr, " +
          s"body_pr${i}pr AS prpr, body_pr${i}qt AS prqt, body_pr${i}va AS prva " +
          s"FROM v WHERE body_t = 'event' AND ${dSlotPresent(i)}")
        .mkString("\n  UNION ALL ")
      s"""WITH ${dGaSessionCtes(
           ", body_pa:'VARCHAR', body_tr:'VARCHAR', body_col:'VARCHAR', " +
           s"body_cos:'VARCHAR', body_ti:'VARCHAR', $dProductColDecls")},
        |$dHitV,
        |pp AS (
        |  $branches)
        |SELECT $dHitHead,
        |  prpr AS hits_product_productPrice,
        |  prqt AS hits_product_productQuantity,
        |  prid AS hits_product_productSKU,
        |  prbr AS hits_product_productBrand,
        |  prva AS hits_product_productVariant,
        |  COALESCE(body_col, '') AS hits_eCommerceAction_option,
        |  COALESCE(body_cos, '') AS hits_eCommerceAction_step,
        |  CASE body_pa WHEN 'click' THEN '1' WHEN 'detail' THEN '2'
        |    WHEN 'add' THEN '3' WHEN 'checkout' THEN '5' WHEN 'purchase' THEN '6'
        |    WHEN 'refund' THEN '7' WHEN 'checkout_option' THEN '8'
        |    ELSE '0' END AS hits_eCommerceAction_action_type,
        |  COALESCE(body_ti, '') AS hits_item_transactionId,
        |  CASE WHEN body_pa = 'purchase'
        |    THEN TRY_CAST(prqt AS DOUBLE) * TRY_CAST(prpr AS DOUBLE)
        |  END AS hits_product_productRevenue,
        |  COALESCE(body_tr, '') AS hits_transaction_transactionRevenue,
        |  'EVENT' AS hits_type
        |FROM pp WHERE prid IS NOT NULL AND prid <> ''""".stripMargin
    },

    // TRANSACTION hits; the unnest mirrors explode_outer multiplicity
    // for hits that (unusually) also carry product slots.
    "q47_ga_hits_transactions" ->
      s"""WITH ${dGaSessionCtes(
           ", body_pa:'VARCHAR', body_tr:'VARCHAR', body_tcc:'VARCHAR', " +
           s"body_ti:'VARCHAR', body_ts:'VARCHAR', body_tt:'VARCHAR', $dProductColDecls")},
        |$dHitV,
        |t AS (
        |  SELECT *, unnest(generate_series(1, greatest(1, $dNSlots))) AS _dup
        |  FROM v WHERE body_t = 'transaction')
        |SELECT $dHitHead,
        |  COALESCE(body_tcc, '') AS hits_transation_transactionCoupon,
        |  COALESCE(body_ti, '') AS hits_transaction_transactionId,
        |  COALESCE(body_tr, '') AS hits_transaction_transactionRevenue,
        |  CASE WHEN is_new = 1 THEN CAST(CAST(rev AS DOUBLE) AS VARCHAR)
        |       ELSE '' END AS totals_transactionRevenue,
        |  COALESCE(body_ts, '') AS hits_transaction_transactionShipping,
        |  COALESCE(body_tt, '') AS hits_transaction_transactionTax
        |FROM t""".stripMargin,

    // ITEM hits (legacy ecommerce), same multiplicity mirror.
    "q48_ga_hits_items" ->
      s"""WITH ${dGaSessionCtes(
           ", body_pa:'VARCHAR', body_tr:'VARCHAR', body_ti:'VARCHAR', " +
           "body_in:'VARCHAR', body_ip:'VARCHAR', body_iq:'VARCHAR', " +
           s"body_ic:'VARCHAR', body_iv:'VARCHAR', $dProductColDecls")},
        |$dHitV,
        |t AS (
        |  SELECT *, unnest(generate_series(1, greatest(1, $dNSlots))) AS _dup
        |  FROM v WHERE body_t = 'item')
        |SELECT $dHitHead,
        |  COALESCE(body_ti, '') AS hits_item_transactionId,
        |  COALESCE(body_in, '') AS hits_item_productName,
        |  COALESCE(body_ip, '') AS hits_item_itemRevenue,
        |  COALESCE(body_iq, '') AS hits_item_itemQuantity,
        |  COALESCE(body_ic, '') AS hits_item_productSku,
        |  COALESCE(body_iv, '') AS hits_item_productCategory
        |FROM t""".stripMargin,

    "q18_ga_enrich_device" ->
      s"""WITH $dRawCtes,
        |b AS (SELECT *, regexp_matches(ua, '(?i)(bot|crawler|spider|slurp|archiver|mediapartners|facebookexternalhit)') AS bot FROM e),
        |c AS (SELECT *,
        |  CASE WHEN contains(ua,'curl/') THEN 'curl'
        |       WHEN contains(ua,'python-requests/') THEN 'Python Requests'
        |       WHEN contains(ua,'Wget/') THEN 'Wget'
        |       WHEN contains(ua,'Go-http-client/') THEN 'Go-http-client'
        |       WHEN contains(ua,'okhttp/') THEN 'okhttp'
        |       WHEN contains(ua,'Apache-HttpClient/') THEN 'Apache-HttpClient'
        |       WHEN contains(ua,'NintendoBrowser/') THEN 'NintendoBrowser'
        |       WHEN contains(ua,'BB10') THEN 'BlackBerry WebKit'
        |       WHEN contains(ua,'; wv)') AND contains(ua,'Chrome/') THEN 'Chrome Mobile WebView'
        |       WHEN contains(ua,'SamsungBrowser/') THEN 'Samsung Internet'
        |       WHEN contains(ua,'UCBrowser/') THEN 'UC Browser'
        |       WHEN contains(ua,'YaBrowser/') THEN 'Yandex Browser'
        |       WHEN contains(ua,'Silk/') THEN 'Amazon Silk'
        |       WHEN contains(ua,'Opera Mini/') THEN 'Opera Mini'
        |       WHEN contains(ua,'OPR/') THEN 'Opera'
        |       WHEN contains(ua,'EdgA/') THEN 'Edge Mobile'
        |       WHEN contains(ua,'Edg/') OR contains(ua,'Edge/') THEN 'Edge'
        |       WHEN contains(ua,'CriOS/') THEN 'Chrome Mobile iOS'
        |       WHEN contains(ua,'FxiOS/') THEN 'Firefox iOS'
        |       WHEN contains(ua,'Chrome/') AND contains(ua,'Mobile') THEN 'Chrome Mobile'
        |       WHEN contains(ua,'Chrome/') THEN 'Chrome'
        |       WHEN contains(ua,'Firefox/') AND (contains(ua,'Android') OR contains(ua,'Mobile') OR contains(ua,'Tablet')) THEN 'Firefox Mobile'
        |       WHEN contains(ua,'Firefox/') THEN 'Firefox'
        |       WHEN (contains(ua,'iPhone') OR contains(ua,'iPad')) AND contains(ua,'Safari') AND contains(ua,'Version/') THEN 'Mobile Safari'
        |       WHEN contains(ua,'Safari') AND contains(ua,'Version/') THEN 'Safari'
        |       WHEN contains(ua,'MSIE') OR contains(ua,'Trident/') THEN 'IE'
        |       ELSE 'Other' END AS cname,
        |  CASE WHEN contains(ua,'KAIOS/') THEN 'KaiOS'
        |       WHEN contains(ua,'SymbOS') THEN 'Symbian OS'
        |       WHEN contains(ua,'BB10') THEN 'BlackBerry OS'
        |       WHEN contains(ua,'Tizen') THEN 'Tizen'
        |       WHEN contains(ua,'PlayStation') THEN 'PlayStation'
        |       WHEN contains(ua,'Nintendo') THEN 'Nintendo'
        |       WHEN contains(ua,'iPhone') OR contains(ua,'iPad') OR contains(ua,'iPod') THEN 'iOS'
        |       WHEN contains(ua,'Android') THEN 'Android'
        |       WHEN contains(ua,'Windows NT') THEN 'Windows'
        |       WHEN contains(ua,'Mac OS X') THEN 'Mac OS X'
        |       WHEN contains(ua,'Linux') THEN 'Linux'
        |       ELSE 'Other' END AS oname,
        |  CASE WHEN contains(ua,'PlayStation') OR contains(ua,'Xbox') OR contains(ua,'Nintendo') THEN 'console'
        |       WHEN contains(ua,'SMART-TV') OR (contains(ua,'Tizen') AND NOT contains(ua,'Mobi')) THEN 'tv'
        |       WHEN contains(ua,'iPad') OR (contains(ua,'Android') AND NOT contains(ua,'Mobile')) THEN 'tablet'
        |       WHEN contains(ua,'iPhone') OR contains(ua,'iPod') OR (contains(ua,'Android') AND contains(ua,'Mobile')) OR contains(ua,'Mobi') THEN 'mobile'
        |       WHEN contains(ua,'Windows') OR contains(ua,'Macintosh') OR contains(ua,'X11') OR contains(ua,'Linux') THEN 'desktop'
        |       ELSE '(not set)' END AS dtype
        | FROM b),
        |d AS (SELECT *,
        |  CASE cname WHEN 'curl' THEN regexp_extract(ua,'curl/$dVerRe',1)
        |             WHEN 'Python Requests' THEN regexp_extract(ua,'python-requests/$dVerRe',1)
        |             WHEN 'Wget' THEN regexp_extract(ua,'Wget/$dVerRe',1)
        |             WHEN 'Go-http-client' THEN regexp_extract(ua,'Go-http-client/$dVerRe',1)
        |             WHEN 'okhttp' THEN regexp_extract(ua,'okhttp/$dVerRe',1)
        |             WHEN 'Apache-HttpClient' THEN regexp_extract(ua,'Apache-HttpClient/$dVerRe',1)
        |             WHEN 'NintendoBrowser' THEN regexp_extract(ua,'NintendoBrowser/$dVerRe',1)
        |             WHEN 'BlackBerry WebKit' THEN regexp_extract(ua,'Version/$dVerRe',1)
        |             WHEN 'Chrome Mobile WebView' THEN regexp_extract(ua,'Chrome/$dVerRe',1)
        |             WHEN 'Samsung Internet' THEN regexp_extract(ua,'SamsungBrowser/$dVerRe',1)
        |             WHEN 'UC Browser' THEN regexp_extract(ua,'UCBrowser/$dVerRe',1)
        |             WHEN 'Yandex Browser' THEN regexp_extract(ua,'YaBrowser/$dVerRe',1)
        |             WHEN 'Amazon Silk' THEN regexp_extract(ua,'Silk/$dVerRe',1)
        |             WHEN 'Opera Mini' THEN regexp_extract(ua,'Opera Mini/$dVerRe',1)
        |             WHEN 'Edge Mobile' THEN regexp_extract(ua,'EdgA/$dVerRe',1)
        |             WHEN 'Edge' THEN regexp_extract(ua,'Edge?/$dVerRe',1)
        |             WHEN 'Opera' THEN regexp_extract(ua,'OPR/$dVerRe',1)
        |             WHEN 'Chrome Mobile iOS' THEN regexp_extract(ua,'CriOS/$dVerRe',1)
        |             WHEN 'Firefox iOS' THEN regexp_extract(ua,'FxiOS/$dVerRe',1)
        |             WHEN 'Chrome Mobile' THEN regexp_extract(ua,'Chrome/$dVerRe',1)
        |             WHEN 'Chrome' THEN regexp_extract(ua,'Chrome/$dVerRe',1)
        |             WHEN 'Firefox Mobile' THEN regexp_extract(ua,'Firefox/$dVerRe',1)
        |             WHEN 'Firefox' THEN regexp_extract(ua,'Firefox/$dVerRe',1)
        |             WHEN 'Mobile Safari' THEN regexp_extract(ua,'Version/$dVerRe',1)
        |             WHEN 'Safari' THEN regexp_extract(ua,'Version/$dVerRe',1)
        |             WHEN 'IE' THEN regexp_extract(ua,'(?:MSIE |rv:)$dVerRe',1)
        |             ELSE '' END AS cver,
        |  CASE oname WHEN 'KaiOS' THEN regexp_extract(ua,'KAIOS/$dVerRe',1)
        |             WHEN 'BlackBerry OS' THEN regexp_extract(ua,'Version/$dVerRe',1)
        |             WHEN 'Tizen' THEN regexp_extract(ua,'Tizen ?$dVerRe',1)
        |             WHEN 'PlayStation' THEN regexp_extract(ua,'PlayStation (?:\\d+|Vita)[/ ]$dVerRe',1)
        |             WHEN 'iOS' THEN replace(regexp_extract(ua,'OS ([0-9_]+)',1),'_','.')
        |             WHEN 'Android' THEN regexp_extract(ua,'Android $dVerRe',1)
        |             WHEN 'Windows' THEN
        |               CASE regexp_extract(ua,'Windows NT ([0-9.]+)',1)
        |                 WHEN '10.0' THEN '10' WHEN '6.3' THEN '8.1' WHEN '6.2' THEN '8'
        |                 WHEN '6.1' THEN '7' WHEN '6.0' THEN 'Vista' WHEN '5.1' THEN 'XP'
        |                 ELSE regexp_extract(ua,'Windows NT ([0-9.]+)',1) END
        |             WHEN 'Mac OS X' THEN replace(regexp_extract(ua,'Mac OS X ([0-9_.]+)',1),'_','.')
        |             ELSE '' END AS over
        | FROM c)
        |SELECT bot AS device_is_bot,
        |  CASE WHEN bot THEN NULL ELSE cname END AS device_client_name,
        |  CASE WHEN bot THEN NULL ELSE cver END AS device_client_version,
        |  CASE WHEN bot THEN NULL ELSE oname END AS device_os_name,
        |  CASE WHEN bot THEN NULL ELSE over END AS device_os_version,
        |  CASE WHEN bot THEN NULL ELSE dtype END AS device_device_type,
        |  COUNT(*) AS n_hits
        |FROM d GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "q19_ga_enrich_geo" ->
      s"""WITH $dRawCtes,
        |b AS (SELECT *, regexp_matches(ua, '(?i)(bot|crawler|spider|slurp|archiver|mediapartners|facebookexternalhit)') AS bot,
        |             $dAnonIp AS ip
        |      FROM e),
        |i AS (SELECT *, ${dIpInt("ip")} AS ipn FROM b),
        |r0 AS (SELECT * FROM read_csv('$GeoRanges', header=true, all_varchar=true)),
        |r AS (SELECT *, ${dIpInt("start_ip")} AS start_int, ${dIpInt("end_ip")} AS end_int FROM r0),
        |j AS (
        |  SELECT i.bot, r.country, r.city, r.city_id
        |  FROM i LEFT JOIN r ON i.ipn >= r.start_int AND i.ipn <= r.end_int)
        |SELECT
        |  CASE WHEN bot THEN NULL WHEN country IS NULL THEN '(not set)' ELSE country END AS geo_country,
        |  CASE WHEN bot THEN NULL WHEN country IS NULL THEN '(not set)' ELSE city END AS geo_city,
        |  CASE WHEN bot THEN NULL WHEN country IS NULL THEN '(not set)' ELSE city_id END AS geo_city_id,
        |  COUNT(*) AS n_hits
        |FROM j GROUP BY 1, 2, 3""".stripMargin,

    // LSH output is exact-verified, and with 16 bands x 4 rows recall at
    // jaccard >= 0.8 is deterministic-complete on this data — so the exact
    // ground truth IS the oracle.
    "q20_dedup_minhash" ->
      s"""WITH ${dShingleCtes()},
        |hh AS (SELECT DISTINCT doc_id, ${dMd5Long("t")} % ${graft.llm.MinHashLsh.P} AS h FROM sh),
        |$dJaccardTail
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8""".stripMargin,

    "q21_dedup_jaccard" ->
      s"""WITH ${dShingleCtes()},
        |hh AS (SELECT doc_id, t AS h FROM sh),
        |$dJaccardTail
        |SELECT doc_a, doc_b, i AS n_shared, n_a, n_b, jaccard
        |FROM j WHERE jaccard >= 0.8""".stripMargin,

    "q22_minhash_sigs" -> {
      import graft.llm.MinHashLsh.{P, aCoef, bCoef}
      val mins = (0 until 4).map(i =>
        s"min((${aCoef(i)} * h + ${bCoef(i)}) % $P) AS mh$i").mkString(",\n  ")
      s"""WITH ${dShingleCtes()},
        |hh AS (SELECT DISTINCT doc_id, ${dMd5Long("t")} % $P AS h FROM sh),
        |m AS (SELECT doc_id,
        |  $mins
        |  FROM hh GROUP BY 1)
        |SELECT doc_id, mh0, mh1, mh2, mh3,
        |  md5(mh0::VARCHAR||'_'||mh1::VARCHAR||'_'||mh2::VARCHAR||'_'||mh3::VARCHAR) AS band0
        |FROM m""".stripMargin
    },

    "q23_simhash" ->
      s"""WITH $dSimhashCtes
        |SELECT doc_id, simhash FROM fp""".stripMargin,

    "q24_text_stats" -> {
      import graft.llm.TextOps.{Stopwords, LangOrder}
      def inList(l: String) = Stopwords(l).map(w => s"'$w'").mkString(", ")
      val scores = LangOrder.map(l =>
        s"len(list_filter(toks, x -> x IN (${inList(l)}))) AS s_$l").mkString(",\n  ")
      val best = "greatest(" + LangOrder.map("s_" + _).mkString(", ") + ")"
      val langCase = (s"CASE WHEN $best = 0 THEN 'unknown'" +:
        LangOrder.map(l => s"WHEN s_$l = $best THEN '$l'")).mkString("\n    ") +
        " ELSE 'unknown' END"
      s"""WITH d AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks FROM documents),
        |t AS (SELECT *, len(toks) AS nt,
        |  round(len(regexp_replace(text,'[A-Za-z0-9\\s]','','g'))*1.0/len(text), 4) AS pr,
        |  $scores
        |  FROM d)
        |SELECT doc_id,
        |  CAST(nt AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subtokens,
        |  pr AS punct_ratio,
        |  round(s_en*1.0/nt, 4) AS stopword_ratio,
        |  $langCase AS lang_pred,
        |  CAST((CASE WHEN nt >= 20 THEN 1 ELSE 0 END)
        |     + (CASE WHEN pr <= 0.1 THEN 1 ELSE 0 END)
        |     + (CASE WHEN round(s_en*1.0/nt, 4) BETWEEN 0.05 AND 0.6 THEN 1 ELSE 0 END)
        |     + (CASE WHEN len(regexp_replace(text,'\\s','','g'))*1.0/nt BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS quality,
        |  md5($dNormText) AS fingerprint
        |FROM t""".stripMargin
    },

    "q25_dedup_exact" ->
      s"""SELECT md5($dNormText) AS fingerprint, COUNT(*) AS n_docs,
        |  MIN(doc_id) AS canonical_doc_id
        |FROM documents GROUP BY 1""".stripMargin,

    // q72: same per-component math (float widened to double, scale =
    // max|x|, round-half-away) — the checksums cover every component.
    "q72_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
        |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(embedding,
        |                x -> CAST(round(CAST(x AS DOUBLE) * 127 / CAST(scale AS DOUBLE)) AS BIGINT)) END AS ql
        |  FROM e)
        |SELECT vec_id, n_dims,
        |  CAST(list_sum(ql) AS BIGINT) AS sum_q,
        |  list_min(ql) AS min_q, list_max(ql) AS max_q,
        |  CAST(len(list_filter(ql, x -> x <> 0)) AS BIGINT) AS nnz
        |FROM q""".stripMargin,

    "q26_ann_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id, ${dCosine("qe", "ce")} AS cosine
        |  FROM q, c WHERE query_id <> neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk FROM s)
        |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cosine
        |FROM r WHERE rk <= 10""".stripMargin,

    "q27_ann_lsh" -> {
      s"""WITH $dLshCtes,
        |qs AS (SELECT vec_id AS query_id, t, sig FROM sv WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT query_id, c.vec_id AS neighbor_id
        |  FROM qs JOIN sv c USING (t, sig) WHERE query_id <> c.vec_id),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |sc AS (
        |  SELECT query_id, neighbor_id, ${dCosine("qq.embedding", "cc.embedding")} AS cosine
        |  FROM cand JOIN e qq ON qq.vec_id = query_id JOIN e cc ON cc.vec_id = neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk FROM sc)
        |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cosine
        |FROM r WHERE rk <= 5""".stripMargin
    },

    "q35_ann_ivf" -> {
      import graft.llm.Similarity.{Dims, IvfCells, IvfProbe}
      s"""WITH c0 AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT $IvfCells),
        |cent AS (
        |  SELECT embedding AS ce,
        |    ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cid
        |  FROM c0),
        |sc AS (
        |  SELECT e.vec_id, e.embedding, cid,
        |    list_sum(list_transform(generate_series(1, $Dims), i -> e.embedding[i]::DOUBLE * ce[i]::DOUBLE))
        |      / sqrt(list_sum(list_transform(ce, x -> x::DOUBLE * x::DOUBLE))) AS score
        |  FROM embeddings e CROSS JOIN cent),
        |rs AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rk FROM sc),
        |asn AS (SELECT vec_id, embedding, cid AS cell FROM rs WHERE rk = 1),
        |qp AS (SELECT vec_id AS query_id, embedding AS qe, cid AS cell
        |       FROM rs WHERE rk <= $IvfProbe AND vec_id < 10),
        |cand AS (
        |  SELECT query_id, qe, a.vec_id AS neighbor_id, a.embedding AS ne
        |  FROM qp JOIN asn a USING (cell) WHERE query_id <> a.vec_id),
        |r AS (SELECT query_id, neighbor_id, ${dCosine("qe", "ne")} AS cosine FROM cand),
        |rk2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM r)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine
        |FROM rk2 WHERE rnk <= 5""".stripMargin
    },

    // q85: codebook from the same md5 reservoir, per-(vec, m) nearest
    // sub-centroid by (dist, cid), ADC as the m-ordered list_sum of
    // per-subspace dists, shortlist by (adc, neighbor_id), exact-cosine
    // rerank — every fold left-to-right like the engine's.
    "q85_ann_pq" -> {
      import graft.llm.Similarity.{PqKs, PqM, PqSub}
      s"""WITH c0 AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT $PqKs),
        |cs AS (
        |  SELECT embedding AS ce,
        |    ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cid
        |  FROM c0),
        |cent AS (
        |  SELECT m, cid, list_slice(ce, m*$PqSub+1, m*$PqSub+$PqSub) AS sub
        |  FROM cs CROSS JOIN (SELECT unnest(generate_series(0, ${PqM - 1})) AS m)),
        |enc0 AS (
        |  SELECT e.vec_id, c.m, c.cid,
        |    list_sum(list_transform(generate_series(1, $PqSub),
        |      i -> (e.embedding[c.m*$PqSub+i]::DOUBLE - c.sub[i]::DOUBLE)
        |         * (e.embedding[c.m*$PqSub+i]::DOUBLE - c.sub[i]::DOUBLE))) AS d
        |  FROM embeddings e CROSS JOIN cent c),
        |enc AS (SELECT vec_id, m, cid FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rk
        |  FROM enc0) WHERE rk = 1),
        |qp AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
        |       WHERE vec_id < 10),
        |pm AS (
        |  SELECT q.query_id, enc.vec_id AS neighbor_id, enc.m,
        |    list_sum(list_transform(generate_series(1, $PqSub),
        |      i -> (q.qe[enc.m*$PqSub+i]::DOUBLE - c.sub[i]::DOUBLE)
        |         * (q.qe[enc.m*$PqSub+i]::DOUBLE - c.sub[i]::DOUBLE))) AS dm
        |  FROM qp q CROSS JOIN enc
        |  JOIN cent c ON c.m = enc.m AND c.cid = enc.cid
        |  WHERE q.query_id <> enc.vec_id),
        |adc AS (SELECT query_id, neighbor_id, list_sum(list(dm ORDER BY m)) AS a
        |  FROM pm GROUP BY 1, 2),
        |sl AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY a, neighbor_id) AS ar
        |  FROM adc) WHERE ar <= 40),
        |r AS (SELECT query_id, neighbor_id, ${dCosine("q.embedding", "n.embedding")} AS cosine
        |  FROM sl JOIN embeddings q ON q.vec_id = query_id
        |  JOIN embeddings n ON n.vec_id = neighbor_id),
        |rk2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM r)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine
        |FROM rk2 WHERE rnk <= 5""".stripMargin
    },

    "q29_ga_framing" ->
      s"""SELECT json_extract_string(r, '$$.message_id') AS message_id,
        |       json_extract_string(r, '$$.body_t') AS body_t
        |FROM (
        |  SELECT unnest(string_split(
        |    replace(content, '}{', '}' || chr(10) || '{'), chr(10))) AS r
        |  FROM read_text('$GaConcat'))
        |WHERE length(trim(r)) > 0""".stripMargin,

    "q30_ga_firehose_response" ->
      s"""SELECT recordId, 'Ok' AS result, TRUE AS has_data
        |FROM read_json('$GaRaw', format='newline_delimited',
        |               columns={recordId:'VARCHAR', data:'VARCHAR'})""".stripMargin,

    "q31_dedup_embedding" ->
      s"""WITH $dLshCtes,
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sv a JOIN sv b USING (t, sig) WHERE a.vec_id < b.vec_id),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |sc AS (
        |  SELECT vec_a, vec_b, ${dCosine("qq.embedding", "cc.embedding")} AS cosine
        |  FROM cand JOIN e qq ON qq.vec_id = vec_a JOIN e cc ON cc.vec_id = vec_b)
        |SELECT vec_a, vec_b, cosine FROM sc WHERE cosine >= 0.4""".stripMargin,

    // q83: the same split/perturbation, digests via md5, null-safe
    // digest compare (IS NOT DISTINCT FROM = Spark's <=>).
    "q83_snapshot_diff" -> {
      val bucket = s"${dMd5Long("doc_id::VARCHAR")} % 100"
      s"""WITH b AS (SELECT doc_id, text, $bucket AS bk FROM documents),
        |o AS (SELECT doc_id, md5(text) AS d FROM b WHERE bk < 90),
        |n AS (SELECT doc_id,
        |  md5(CASE WHEN bk % 7 = 0 THEN text || ' v2' ELSE text END) AS d
        |  FROM b WHERE bk >= 5)
        |SELECT doc_id AS key,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.d IS NOT DISTINCT FROM n.d THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n USING (doc_id)""".stripMargin
    },

    // q82: the same conditional sums + duplicated-key count, report
    // rows as a UNION ALL of literal-named projections.
    "q82_expectations" ->
      """WITH agg AS (SELECT
        |  CAST(COUNT(*) AS DOUBLE) AS total,
        |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nn_eid,
        |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nn_uid,
        |  CAST(SUM(CASE WHEN value IS NULL OR value < 0.0 OR value > 500.0 THEN 1 ELSE 0 END) AS DOUBLE) AS r500,
        |  CAST(SUM(CASE WHEN value IS NULL OR value < 0.0 OR value > 100.0 THEN 1 ELSE 0 END) AS DOUBLE) AS r100,
        |  CAST(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN ('click','view','signup','error','purchase') THEN 1 ELSE 0 END) AS DOUBLE) AS iset
        |  FROM events),
        |dup AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM (
        |  SELECT event_id FROM events GROUP BY 1 HAVING COUNT(*) > 1))
        |SELECT 'not_null' AS rule, 'event_id' AS col, nn_eid AS observed, nn_eid = 0 AS passed FROM agg
        |UNION ALL SELECT 'not_null', 'user_id', nn_uid, nn_uid = 0 FROM agg
        |UNION ALL SELECT 'in_range(0.0,500.0)', 'value', r500, r500 = 0 FROM agg
        |UNION ALL SELECT 'in_range(0.0,100.0)', 'value', r100, r100 = 0 FROM agg
        |UNION ALL SELECT 'in_set', 'event_type', iset, iset = 0 FROM agg
        |UNION ALL SELECT 'min_rows', '', total, total >= 1000 FROM agg
        |UNION ALL SELECT 'unique', 'event_id', d, d = 0 FROM dup""".stripMargin,

    // q81: the gram_hashes fold mirrored per position (1-based here,
    // 0-based in the engine — only position DIFFERENCES reach the
    // output), duplicated grams by total occurrence count, lag-window
    // interval merge, zero-filled left join.
    "q81_substring_dedup" ->
      s"""WITH $dSubstrSpanCtes,
        |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(SUM(e - s) AS BIGINT) AS n_dup_chars FROM spn GROUP BY 1)
        |SELECT d.doc_id, COALESCE(n_spans, 0) AS n_spans,
        |  COALESCE(n_dup_chars, 0) AS n_dup_chars
        |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin,

    // q84: the kept SEGMENTS around each doc's merged spans (head gap,
    // inter-span gaps via lag, tail gap), concatenated in order —
    // substr is code-point based like the engine's cut. Span-free and
    // sub-k docs pass through byte-identical via the COALESCE.
    "q84_substring_clean" ->
      s"""WITH $dSubstrSpanCtes,
        |segs AS (
        |  SELECT doc_id,
        |    COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS gs,
        |    s AS ge
        |  FROM spn
        |  UNION ALL
        |  SELECT spn.doc_id, MAX(spn.e),
        |    MAX(len(regexp_extract_all(d.text, '(?s).'))) + 1
        |  FROM spn JOIN documents d USING (doc_id) GROUP BY spn.doc_id),
        |cut AS (
        |  SELECT segs.doc_id,
        |    string_agg(substr(d.text, gs::INT, (ge - gs)::INT), '' ORDER BY gs) AS ct
        |  FROM segs JOIN documents d USING (doc_id) GROUP BY segs.doc_id)
        |SELECT d.doc_id, COALESCE(cut.ct, d.text) AS clean_text
        |FROM documents d LEFT JOIN cut USING (doc_id)""".stripMargin,

    // q86: the same six page templates rebuilt in SQL, then the
    // semantics-DEFINING chain verbatim — every regex construct is in
    // the Java∩RE2 common subset ((?is), non-greedy, \b, negated
    // classes), so Spark's native pass and DuckDB must agree byte-for-
    // byte. Plain (non-interpolated) literal: backslashes reach DuckDB
    // untouched.
    "q86_html_extract" ->
      """WITH pg AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN '<html><head><title>T</title><style type="text/css">p { color: red; }</style></head><body><p>' || text || '</p></body></html>'
        |      WHEN 1 THEN '<body><script type="text/javascript">if (1 < 2 && x > 0) { f("hi"); }</script><div class="main">' || text || '</div></body>'
        |      WHEN 2 THEN '<p>before<!-- <p>hidden</p> secret --> ' || text || '<!-- tail --></p>'
        |      WHEN 3 THEN '<p>a &amp;lt; b &lt;i&gt;it&lt;/i&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y ' || text || '</p>'
        |      WHEN 4 THEN '<DIV CLASS="X"><H1>' || text || '</H1><BR><hr/></DIV>'
        |      ELSE '<a title="a>b" href="u">' || text || '</a><SCRIPT>var s = "x</scriptx>";</SCRIPT>done'
        |    END AS h
        |  FROM documents),
        |p1 AS (SELECT doc_id, regexp_replace(h, '(?s)<!--.*?-->', '', 'g') AS h FROM pg),
        |p2 AS (SELECT doc_id, regexp_replace(h, '(?is)<script\b[^>]*>.*?</script[ \t\n\r]*>', '', 'g') AS h FROM p1),
        |p3 AS (SELECT doc_id, regexp_replace(h, '(?is)<style\b[^>]*>.*?</style[ \t\n\r]*>', '', 'g') AS h FROM p2),
        |p4 AS (SELECT doc_id, regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h FROM p3),
        |p5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(h,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS h FROM p4)
        |SELECT doc_id, trim(regexp_replace(h, '[ \t\n\r\f]+', ' ', 'g')) AS text
        |FROM p5""".stripMargin,

    // q87: the same eight URL shapes rebuilt in SQL, then the same
    // dissection regexes (Java∩RE2 subset), the same list_filter of
    // tracking params (order preserved), the same suffix-list domain
    // CASE (list generated from UrlOps.twoLevelSuffixes — one source),
    // and the blocklist as NOT IN.
    "q87_url_normalize" -> {
      val sfx = graft.llm.UrlOps.twoLevelSuffixes.map(x => s"'$x'").mkString(", ")
      s"""WITH uu AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'https://WWW.Example.COM:443/path/page?utm_source=x&id=' || doc_id::VARCHAR || '#frag'
        |      WHEN 1 THEN 'http://Blog.example.co.uk:80/a/b/?gclid=123&q=term' || doc_id::VARCHAR
        |      WHEN 2 THEN 'https://spam.example/buy' || doc_id::VARCHAR || '?fbclid=abc'
        |      WHEN 3 THEN 'http://192.168.10.' || (doc_id % 256)::VARCHAR || '/index.html'
        |      WHEN 4 THEN 'https://sub.ads.co.uk/x?a=' || doc_id::VARCHAR || '&b=2#sec'
        |      WHEN 5 THEN 'HTTPS://News.Site.ORG/Article/' || doc_id::VARCHAR || '/'
        |      WHEN 6 THEN 'http://example.com.au/?utm_campaign=c&utm_term=' || doc_id::VARCHAR
        |      ELSE 'https://a.b.example.com:8443/deep/path?z=' || doc_id::VARCHAR || '&gclid=g'
        |    END AS url
        |  FROM documents),
        |d1 AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1) AS rest
        |  FROM uu),
        |d2 AS (SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS auth FROM d1),
        |d3 AS (
        |  SELECT *,
        |    lower(regexp_extract(auth, '^([^:]*)', 1)) AS host,
        |    regexp_extract(auth, ':([0-9]+)${"$"}', 1) AS prt,
        |    regexp_extract(substr(rest, len(auth) + 1), '^([^?]*)', 1) AS pth,
        |    regexp_extract(substr(rest, len(auth) + 1), '\\?(.*)${"$"}', 1) AS qry
        |  FROM d2),
        |d4 AS (
        |  SELECT *,
        |    array_to_string(list_filter(string_split(qry, '&'),
        |      p -> NOT (starts_with(p, 'utm_') OR
        |        list_contains(['gclid','dclid','fbclid','msclkid'], string_split(p, '=')[1]))), '&') AS cq,
        |    regexp_replace(pth, '/${"$"}', '') AS cp,
        |    string_split(host, '.') AS ls
        |  FROM d3),
        |d5 AS (
        |  SELECT doc_id,
        |    sch || '://' || host ||
        |      CASE WHEN prt <> '' AND NOT ((sch = 'http' AND prt = '80') OR (sch = 'https' AND prt = '443'))
        |        THEN ':' || prt ELSE '' END ||
        |      cp || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END AS url_norm,
        |    CASE WHEN regexp_matches(host, '^[0-9.]+${"$"}') OR len(ls) <= 2 THEN host
        |         WHEN ls[-2] || '.' || ls[-1] IN ($sfx)
        |           THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        |         ELSE ls[-2] || '.' || ls[-1] END AS domain
        |  FROM d4)
        |SELECT doc_id, url_norm, domain FROM d5
        |WHERE domain NOT IN ('spam.example', 'ads.co.uk')""".stripMargin
    },

    // q88: q86's extraction chain + q87's domain dissection joined on
    // doc_id, the blocklist/quality WHERE, and the q25-style
    // min-per-fingerprint survivor join.
    "q88_web_pipeline" -> {
      val sfx = graft.llm.UrlOps.twoLevelSuffixes.map(x => s"'$x'").mkString(", ")
      s"""WITH pg AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN '<html><head><title>T</title><style type="text/css">p { color: red; }</style></head><body><p>' || text || '</p></body></html>'
        |      WHEN 1 THEN '<body><script type="text/javascript">if (1 < 2 && x > 0) { f("hi"); }</script><div class="main">' || text || '</div></body>'
        |      WHEN 2 THEN '<p>before<!-- <p>hidden</p> secret --> ' || text || '<!-- tail --></p>'
        |      WHEN 3 THEN '<p>a &amp;lt; b &lt;i&gt;it&lt;/i&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y ' || text || '</p>'
        |      WHEN 4 THEN '<DIV CLASS="X"><H1>' || text || '</H1><BR><hr/></DIV>'
        |      ELSE '<a title="a>b" href="u">' || text || '</a><SCRIPT>var s = "x</scriptx>";</SCRIPT>done'
        |    END AS h
        |  FROM documents),
        |p1 AS (SELECT doc_id, regexp_replace(h, '(?s)<!--.*?-->', '', 'g') AS h FROM pg),
        |p2 AS (SELECT doc_id, regexp_replace(h, '(?is)<script\\b[^>]*>.*?</script[ \\t\\n\\r]*>', '', 'g') AS h FROM p1),
        |p3 AS (SELECT doc_id, regexp_replace(h, '(?is)<style\\b[^>]*>.*?</style[ \\t\\n\\r]*>', '', 'g') AS h FROM p2),
        |p4 AS (SELECT doc_id, regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h FROM p3),
        |p5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(h,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS h FROM p4),
        |ext AS (SELECT doc_id, trim(regexp_replace(h, '[ \\t\\n\\r\\f]+', ' ', 'g')) AS text FROM p5),
        |uu AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'https://WWW.Example.COM:443/path/page?utm_source=x&id=' || doc_id::VARCHAR || '#frag'
        |      WHEN 1 THEN 'http://Blog.example.co.uk:80/a/b/?gclid=123&q=term' || doc_id::VARCHAR
        |      WHEN 2 THEN 'https://spam.example/buy' || doc_id::VARCHAR || '?fbclid=abc'
        |      WHEN 3 THEN 'http://192.168.10.' || (doc_id % 256)::VARCHAR || '/index.html'
        |      WHEN 4 THEN 'https://sub.ads.co.uk/x?a=' || doc_id::VARCHAR || '&b=2#sec'
        |      WHEN 5 THEN 'HTTPS://News.Site.ORG/Article/' || doc_id::VARCHAR || '/'
        |      WHEN 6 THEN 'http://example.com.au/?utm_campaign=c&utm_term=' || doc_id::VARCHAR
        |      ELSE 'https://a.b.example.com:8443/deep/path?z=' || doc_id::VARCHAR || '&gclid=g'
        |    END AS url
        |  FROM documents),
        |du AS (
        |  SELECT doc_id, lower(regexp_extract(regexp_extract(
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1),
        |    '^([^/?]*)', 1), '^([^:]*)', 1)) AS host
        |  FROM uu),
        |dd AS (
        |  SELECT doc_id,
        |    CASE WHEN regexp_matches(host, '^[0-9.]+${"$"}') OR len(ls) <= 2 THEN host
        |         WHEN ls[-2] || '.' || ls[-1] IN ($sfx)
        |           THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        |         ELSE ls[-2] || '.' || ls[-1] END AS domain
        |  FROM (SELECT doc_id, host, string_split(host, '.') AS ls FROM du)),
        |j AS (
        |  SELECT e.doc_id, dd.domain, e.text
        |  FROM ext e JOIN dd USING (doc_id)
        |  WHERE dd.domain NOT IN ('spam.example', 'ads.co.uk')
        |    AND len(list_filter(string_split(e.text, ' '), x -> x <> '')) >= 30),
        |sv AS (SELECT md5(text) AS fp, MIN(doc_id) AS doc_id FROM j GROUP BY 1)
        |SELECT j.doc_id, j.domain, j.text
        |FROM j JOIN sv ON md5(j.text) = sv.fp AND j.doc_id = sv.doc_id""".stripMargin
    },

    // q79: q31's LSH-mirrored pair CTEs + the q37 recursive closure,
    // survivors out (cluster minimum kept, unpaired vectors untouched).
    "q79_semantic_dedup" ->
      s"""WITH RECURSIVE $dLshCtes,
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sv a JOIN sv b USING (t, sig) WHERE a.vec_id < b.vec_id),
        |e AS (SELECT vec_id, embedding FROM embeddings),
        |sc AS (
        |  SELECT vec_a, vec_b, ${dCosine("qq.embedding", "cc.embedding")} AS cosine
        |  FROM cand JOIN e qq ON qq.vec_id = vec_a JOIN e cc ON cc.vec_id = vec_b),
        |prs AS (SELECT vec_a, vec_b FROM sc WHERE cosine >= 0.4),
        |edges AS (SELECT vec_a AS a, vec_b AS b FROM prs
        |          UNION SELECT vec_b, vec_a FROM prs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, g.b FROM reach r JOIN edges g ON r.dst = g.a),
        |comp AS (SELECT src AS vec_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM comp WHERE vec_id <> cluster_id)""".stripMargin,

    // q80: same double-division-then-floor rate arithmetic as the
    // engine (IEEE-identical on identical integer inputs), bottleneck
    // tie broken on the stratum value, q51's md5 sampling predicate.
    "q80_mixture_sample" ->
      s"""WITH w(lang, wt) AS (VALUES
        |  ('en', 4), ('de', 2), ('fr', 2), ('es', 1), ('zh', 1)),
        |n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY 1),
        |cw AS (SELECT n.lang, n_s, wt FROM n JOIN w USING (lang)),
        |b AS (SELECT n_s AS nb, wt AS wb FROM cw
        |      ORDER BY n_s * 1.0 / wt, lang LIMIT 1),
        |r AS (SELECT lang,
        |        CAST(floor(1000.0 * wt * nb / (wb * n_s)) AS BIGINT) AS pm
        |      FROM cw, b)
        |SELECT doc_id, lang FROM documents JOIN r USING (lang)
        |WHERE ${dMd5Long("doc_id::VARCHAR||'mix'")} % 1000 < pm""".stripMargin,

    // Dotall '.' so the mirror walks newline code points the same way
    // RollingHash's codePoints() pass does (RE2 '.' skips \n otherwise).
    "q33_rolling_hash" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) > 0
        |    THEN list_reduce(
        |           list_transform(regexp_extract_all(text, '(?s).'), c -> ascii(c)::BIGINT),
        |           (a, c) -> (a * 31 + c) % 2147483647)
        |    ELSE 0 END AS rhash
        |FROM documents""".stripMargin,

    "q34_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n_rows,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1""".stripMargin,

    // Mirrors Multimodal.syntheticMedia + decodeStub: payload byte i of
    // media m is (m*31 + i*7) % 251; feature j sums the 16-byte window
    // starting at j*16 (the float32 1/4080 scaling is inverted on the
    // Spark side, so the oracle stays integer-exact).
    "q36_multimodal_features" ->
      """WITH jj AS (
        |  SELECT m.media_id, j.j
        |  FROM generate_series(0, 499) m(media_id), generate_series(0, 15) j(j)),
        |s AS (
        |  SELECT media_id, j,
        |    list_sum(list_transform(
        |      generate_series(media_id*31 + (j*16)*7, media_id*31 + (j*16+15)*7, 7),
        |      x -> x % 251)) AS sb
        |  FROM jj)
        |SELECT media_id,
        |  CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(j AS BIGINT) AS j,
        |  CAST(sb AS BIGINT) AS window_sum
        |FROM s""".stripMargin,

    // Components via transitive closure (WITH RECURSIVE; the UNION
    // dedups, so the closure terminates) — valid ground truth because
    // the pair set at sf-scale is tiny.
    "q37_dedup_clusters" ->
      s"""WITH RECURSIVE ${dShingleCtes()},
        |hh AS (SELECT DISTINCT doc_id, ${dMd5Long("t")} % ${graft.llm.MinHashLsh.P} AS h FROM sh),
        |$dJaccardTail,
        |prs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs UNION SELECT doc_b, doc_a FROM prs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        |SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src""".stripMargin,

    "q38_dedup_survivors" ->
      s"""WITH RECURSIVE ${dShingleCtes()},
        |hh AS (SELECT DISTINCT doc_id, ${dMd5Long("t")} % ${graft.llm.MinHashLsh.P} AS h FROM sh),
        |$dJaccardTail,
        |prs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs UNION SELECT doc_b, doc_a FROM prs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
        |SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)""".stripMargin,

    "q44_repetition" ->
      """WITH w AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS ws FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-1, 0)), i -> ws[i] || ' ' || ws[i+1])) AS g FROM w),
        |c2 AS (SELECT doc_id, MAX(cnt * len(g)) AS cover
        |       FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2) GROUP BY 1),
        |g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g FROM w),
        |c3 AS (SELECT doc_id, MAX(cnt * len(g)) AS cover
        |       FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2) GROUP BY 1),
        |ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents),
        |dl AS (SELECT doc_id, SUM(CASE WHEN cnt >= 2 THEN cnt * len(l) ELSE 0 END) AS dup
        |       FROM (SELECT doc_id, l, COUNT(*) AS cnt FROM ln GROUP BY 1, 2) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(c2.cover, 0) AS BIGINT) AS top2_cover,
        |  CAST(COALESCE(c3.cover, 0) AS BIGINT) AS top3_cover,
        |  CAST(COALESCE(dl.dup, 0) AS BIGINT) AS dup_line_chars
        |FROM documents d
        |LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
        |LEFT JOIN dl USING (doc_id)""".stripMargin,

    "q42_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  COUNT(*) AS n_rows
        |FROM events GROUP BY 1""".stripMargin,

    // q49's gate is one-sided by construction: DuckDB cannot reproduce
    // Spark's sketch values, so the oracle states the rank-error
    // CONTRACT (every approx value inside its exact ±0.005-rank window
    // ⇒ all-true booleans). The Spark side computes the windows from
    // exact percentiles; any sketch regression flips a boolean and
    // hash-fails this row.
    "q49_percentiles_approx" ->
      """SELECT event_type,
        |  TRUE AS p50_in_bounds,
        |  TRUE AS p95_in_bounds,
        |  COUNT(*) AS n_rows
        |FROM events GROUP BY 1""".stripMargin,

    // q62's one-sided gate, like q49: the exact distinct counts are
    // hash-compared directly; the oracle states the HLL bound contract
    // as all-true booleans (DuckDB can't reproduce Spark's sketch).
    "q62_distinct_approx" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  TRUE AS users_in_bounds,
        |  COUNT(DISTINCT event_id) AS n_event_ids,
        |  TRUE AS event_ids_in_bounds,
        |  COUNT(*) AS n_rows
        |FROM events GROUP BY 1""".stripMargin,

    // Aggregates computed by the independent fixture generator
    // (scripts/make_media_fixtures.py) from the same integer formulas
    // that produced the BMP/WAV bytes — the Scala decoders never see
    // that code, so a match proves the real container parse.
    "q57_multimodal_decode" ->
      s"""SELECT name, kind,
        |  width::BIGINT AS width, height::BIGINT AS height,
        |  sample_rate::BIGINT AS sample_rate, n_units::BIGINT AS n_units,
        |  value_sum::BIGINT AS value_sum, first_unit::BIGINT AS first_unit
        |FROM read_csv('$MediaExpected', header=true)""".stripMargin,

    // Winnowing mirror: k-gram Rabin-Karp hashes via list_reduce folds,
    // per-window minima via list_min over slices (O(n·w) — fine at sf;
    // the engine's native pass is O(n)), then the same df-capped
    // fingerprint self-join.
    "q56_winnow_spans" -> dWinnowSpanSql("documents"),

    // Same mirror over the checked-in multi-line/non-ASCII fixture: the
    // sf documents carry no newlines and little non-ASCII, so q56 alone
    // never exercises the dotall '.' nor astral code points (round-5
    // advice). The fixture plants shared spans crossing \n with CJK,
    // Cyrillic, combining accents and astral emoji.
    "q60_winnow_multiline" ->
      s"""WITH $dMultilineCte,
        |${dWinnowSpanSql("ml").stripPrefix("WITH ")}""".stripMargin,

    // BM25 mirror: identical expression tree (same association order) so
    // the doubles match bit-for-bit before the round; the per-doc sum is
    // the alphabetical-term fold (+0.0 for absent terms is exact), the
    // corpus scalars reduce from exact integer sums, and the k1/b
    // literals are Scala shortest-repr doubles that parse back equal.
    "q55_bm25" -> {
      val (k1, b) = (1.2, 0.75)
      val terms = Seq("hash", "merge", "vector")
      val inList = terms.map("'" + _ + "'").mkString(", ")
      // Bm25.score folds per-doc term scores in term-sorted (UTF8 binary)
      // order via sort_array; the mirror's fold MUST use terms.sorted too
      // or a non-alphabetical query would drift by a last-ulp double.
      val branches = terms.sorted.map(t =>
        s"COALESCE(MAX(CASE WHEN term = '$t' THEN s END), 0)").mkString(" + ")
      s"""WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |dlt AS (SELECT doc_id, CAST(COALESCE(len(toks), 0) AS BIGINT) AS dl, toks FROM w),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dlt),
        |tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM dlt),
        |qt AS (SELECT * FROM tok WHERE term IN ($inList)),
        |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM qt GROUP BY 1, 2, 3),
        |dft AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM qt GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term,
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * ${k1 + 1}) /
        |      (tf + $k1 * (${1 - b} + $b * dl / avgdl)) AS s
        |  FROM tf JOIN dft USING (term) CROSS JOIN st)
        |SELECT doc_id, round($branches, 4) AS score
        |FROM sc GROUP BY doc_id""".stripMargin
    },

    // q96: q39's raw-gram ground-truth CTEs with the candidate gate on
    // the ROUNDED jaccard >= 0.5 — exactly the engine's
    // jaccardJoinFromSets filter (round(j,4) >= threshold), the same
    // mirroring q21/q39 use; an exact integer gate here would disagree
    // with the engine at the 0.49995 rounding boundary. Then byte-based
    // levenshtein (== code-point on this ASCII corpus).
    "q96_edit_distance_pairs" ->
      s"""WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(text) - 4, 0)),
        |    i -> substr(text, i, 5))) AS gs
        |  FROM documents),
        |hh AS (SELECT doc_id, unnest(gs) AS h FROM g),
        |$dJaccardTail,
        |c AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |p AS (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
        |    round(CAST(levenshtein(da.text, db.text) AS DOUBLE) /
        |      CAST(greatest(len(da.text), len(db.text)) AS DOUBLE), 4) AS rel
        |  FROM c JOIN documents da ON da.doc_id = c.doc_a
        |         JOIN documents db ON db.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, lev, rel FROM p WHERE rel <= 0.25""".stripMargin,

    // q97: the ascending-code-point entropy fold recomputed with
    // list_reduce(list(... ORDER BY cp)) — 0.0-seeded engine fold and
    // first-element-seeded list_reduce agree exactly (0.0 + x = x);
    // the +0.0 collapses -0.0 for single-symbol texts on both sides.
    "q97_char_entropy" -> dEntropySql("documents"),

    // q98: Monday-start ISO weeks in both engines; integer day
    // arithmetic for the offset.
    "q98_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
        |f AS (SELECT user_id, MIN(w) AS cohort_week FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, w AS active_week FROM e)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,

    // q99: the same stage chain as Cohorts.funnel — conditional MIN
    // strictly after the previous stage's first completion.
    "q99_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, MIN(ms) AS t1_ms FROM e
        |       WHERE t = 'signup' GROUP BY 1),
        |s2 AS (SELECT user_id, MIN(ms) AS t2_ms FROM e JOIN s1 USING (user_id)
        |       WHERE t = 'view' AND ms > t1_ms GROUP BY 1),
        |s3 AS (SELECT user_id, MIN(ms) AS t3_ms FROM e JOIN s2 USING (user_id)
        |       WHERE t = 'purchase' AND ms > t2_ms GROUP BY 1)
        |SELECT s1.user_id, t1_ms, t2_ms, t3_ms,
        |  CAST(CASE WHEN t1_ms IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN t2_ms IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN t3_ms IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    // q91: identical expression tree to BigramLm.score — per-doc fold
    // over list(c ORDER BY bg), same add-0.5 smoothing arithmetic, V
    // from the unigram vocab.
    "q91_bigram_lm" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |bgt AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bg
        |  FROM w),
        |tf AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf FROM bgt GROUP BY 1, 2),
        |c2 AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c2) AS BIGINT) AS c1
        |       FROM c2 GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
        |      FROM (SELECT unnest(toks) AS t FROM w)),
        |co AS (
        |  SELECT doc_id, bg, tf,
        |    CAST(tf AS DOUBLE) * ln((CAST(c2 AS DOUBLE) + 0.5) /
        |      (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE))) AS c
        |  FROM tf JOIN c2 USING (bg)
        |  JOIN c1 ON split_part(bg, ' ', 1) = w1 CROSS JOIN v),
        |sm AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |    list_reduce(list(c ORDER BY bg), (a, b) -> a + b) AS s
        |  FROM co GROUP BY 1)
        |SELECT d.doc_id, COALESCE(sm.n_bigrams, 0) AS n_bigrams,
        |  round(-sm.s / sm.n_bigrams, 4) AS xent
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN sm USING (doc_id)""".stripMargin,

    // q93: the filter recomputed verbatim (k=3 md5 probes mod 2^16 over
    // the test split's fingerprints); bloom_hit = all probes present,
    // and the one-sided no-false-negative contract must be all-true.
    "q93_bloom_prune" -> {
      val b = dMd5Long("doc_id::VARCHAR") + " % 100"
      def probe(e: String) = dMd5Long(s"$e||'#'||i::VARCHAR") + " % 65536"
      s"""WITH sp AS (
        |  SELECT doc_id, md5(text) AS fp,
        |    CASE WHEN $b < 80 THEN 'train'
        |         WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM documents),
        |tr AS (SELECT doc_id, fp FROM sp WHERE split = 'train'),
        |ev AS (SELECT DISTINCT fp FROM sp WHERE split = 'test'),
        |bits AS (
        |  SELECT DISTINCT ${probe("fp")} AS p
        |  FROM ev, generate_series(0, 2) g(i)),
        |tp AS (
        |  SELECT doc_id, fp, ${probe("fp")} AS p
        |  FROM tr, generate_series(0, 2) g(i)),
        |bh AS (
        |  SELECT doc_id, fp,
        |    COUNT(*) FILTER (WHERE p IN (SELECT p FROM bits)) = 3 AS bloom_hit
        |  FROM tp GROUP BY 1, 2)
        |SELECT doc_id, bloom_hit,
        |  fp IN (SELECT fp FROM ev) AS exact_hit,
        |  (bloom_hit OR fp NOT IN (SELECT fp FROM ev)) AS no_false_negative
        |FROM bh""".stripMargin
    },

    // q95: the Morton interleave unrolled to the same 10 shift/mask/or
    // pairs, then the per-z-range min/max stats.
    "q95_zorder_layout" -> {
      val z = (0 until 10).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH d AS (
        |  SELECT CAST(o_custkey % 1024 AS BIGINT) AS x,
        |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) % 1024 AS BIGINT) AS y
        |  FROM orders),
        |zz AS (SELECT x, y, ($z) AS z FROM d)
        |SELECT CAST(z // 65536 AS BIGINT) AS z_range,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(x) AS min_x, MAX(x) AS max_x,
        |  MIN(y) AS min_y, MAX(y) AS max_y
        |FROM zz GROUP BY 1""".stripMargin
    },

    // q89: identical expression tree to TfIdf.topTerms (tf * (ln((N+1)/
    // (df+1)) + 1), rounded to 6 on both sides); top-3 via the window
    // formulation, ORDER BY (score, term, tf) DESC mirroring the
    // engine's lexicographic struct heap.
    "q89_tfidf_topk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM w),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (
        |  SELECT doc_id, term, tf,
        |    round(CAST(tf AS DOUBLE) *
        |      (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0),
        |      6) AS score
        |  FROM tf JOIN dft USING (term) CROSS JOIN nd),
        |rk AS (
        |  SELECT doc_id, term, tf, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term DESC, tf DESC) AS BIGINT) AS rank
        |  FROM sc)
        |SELECT doc_id, term, tf, score, rank FROM rk WHERE rank <= 3""".stripMargin,

    // q90: the A-ES log-key recomputed verbatim — u from the salted
    // md5-long (+0.5, /2^60), key = ln(u)/w, top-20 per lang by
    // (key, doc_id, w) DESC exactly as the engine's struct heap orders.
    "q90_weighted_sample" ->
      s"""WITH w AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
        |      AS BIGINT) + 1 AS wt
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, lang, wt,
        |    ln((${dMd5Long("doc_id::VARCHAR||'wrs'")}::DOUBLE + 0.5) /
        |       1152921504606846976.0) / CAST(wt AS DOUBLE) AS key
        |  FROM w),
        |rk AS (
        |  SELECT lang, doc_id, wt,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY key DESC, doc_id DESC, wt DESC) AS BIGINT) AS rank
        |  FROM k)
        |SELECT lang, doc_id, wt AS weight, rank FROM rk WHERE rank <= 20""".stripMargin,

    // q92: same starts (range(0, n, stride) with the redundant-tail
    // filter), same inclusive-slice arithmetic; DuckDB list_slice is
    // [s+1, s+40] inclusive = Spark slice(start, length=40).
    "q92_doc_chunks" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM w
        |      WHERE len(toks) > 0),
        |st AS (SELECT doc_id, toks, n, unnest(range(0, n, 30)) AS s FROM d)
        |SELECT doc_id, CAST(s // 30 AS BIGINT) AS chunk_id,
        |  LEAST(40, n - s) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, s + 1, s + 40), ' ') AS chunk_text
        |FROM st WHERE s = 0 OR s - 30 + 40 < n""".stripMargin,

    // q94: GROUP BY CUBE with GROUPING flags; token counts via the q24
    // whitespace-token definition.
    "q94_cube_report" ->
      """WITH d AS (
        |  SELECT lang, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))
        |      AS BIGINT) AS nt
        |  FROM documents)
        |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS sum_tokens,
        |  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        |  CAST(GROUPING(source) AS BIGINT) AS g_source
        |FROM d GROUP BY CUBE (lang, source)""".stripMargin,

    // q75: identical expression tree to TextOps.unigramSurprisal — the
    // per-doc fold runs over list(c ORDER BY term), matching the
    // engine's sort_array fold ((0+c1)+c2… ≡ (c1+c2)… exactly in IEEE
    // since 0.0+x = x for finite x).
    "q75_unigram_surprisal" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |dlt AS (SELECT doc_id, CAST(COALESCE(len(toks), 0) AS BIGINT) AS dl, toks FROM w),
        |tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM dlt),
        |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2, 3),
        |gc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
        |co AS (
        |  SELECT doc_id, dl, term,
        |    CAST(tf AS DOUBLE) * ln(CAST(cnt AS DOUBLE) / n) AS c
        |  FROM tf JOIN gc USING (term) CROSS JOIN tot),
        |sm AS (
        |  SELECT doc_id, dl, list_reduce(list(c ORDER BY term), (a, b) -> a + b) AS s
        |  FROM co GROUP BY 1, 2)
        |SELECT d.doc_id, d.dl, round(-sm.s / d.dl, 4) AS surprisal
        |FROM dlt d LEFT JOIN sm USING (doc_id, dl)""".stripMargin,

    "q54_vocab_stats" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents)
        |SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |FROM w GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3""".stripMargin,

    // q63: exact heavy hitters hash-checked; `captured` states the
    // freqItems superset guarantee (one-sided, like q49/q62 — DuckDB
    // can't reproduce the sketch, only the contract).
    "q63_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM w),
        |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1)
        |SELECT term, cnt, TRUE AS captured
        |FROM c, tot WHERE cnt > n_total * 0.01""".stripMargin,

    "q74_pivot_langs" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val cols = (langs.map(l =>
        s"CAST(SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS $l") :+
        s"CAST(SUM(CASE WHEN lang NOT IN (${langs.map("'" + _ + "'").mkString(", ")}) " +
          "OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS other").mkString(",\n  ")
      s"""SELECT source,
        |  $cols
        |FROM documents GROUP BY 1""".stripMargin
    },

    "q73_rollup_report" ->
      """SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(GROUPING(source) AS BIGINT) AS g_source,
        |  CAST(GROUPING(lang) AS BIGINT) AS g_lang
        |FROM documents GROUP BY ROLLUP(source, lang)""".stripMargin,

    // q65: the greedy packing chain per shard, one recursive step per
    // document position (same pattern as q58's horizon chain).
    "q65_sequence_packing" -> dPackChainSql,

    // q71: exact heavy-term counts hash-checked; the CMS contract
    // (never-underestimate + bounded overestimate at fixed seed) stated
    // as all-true booleans, one-sided like q49/q62/q63.
    "q71_cms_counts" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM w),
        |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1)
        |SELECT term, cnt, TRUE AS never_under, TRUE AS within_width
        |FROM c, tot WHERE cnt > n_total * 0.01""".stripMargin,

    // q64: the q24 per-doc quality formula aggregated per (source, lang).
    "q64_corpus_report" -> {
      import graft.llm.TextOps.Stopwords
      val inList = Stopwords("en").map(w => s"'$w'").mkString(", ")
      s"""WITH d AS (SELECT source, lang, text, n_chars,
        |    string_split_regex(text, '\\s+') AS toks FROM documents),
        |t AS (SELECT *, len(toks) AS nt,
        |  round(len(regexp_replace(text,'[A-Za-z0-9\\s]','','g'))*1.0/len(text), 4) AS pr,
        |  len(list_filter(toks, x -> x IN ($inList))) AS s_en
        |  FROM d),
        |q AS (SELECT source, lang, n_chars,
        |  (CASE WHEN nt >= 20 THEN 1 ELSE 0 END)
        |   + (CASE WHEN pr <= 0.1 THEN 1 ELSE 0 END)
        |   + (CASE WHEN round(s_en*1.0/nt, 4) BETWEEN 0.05 AND 0.6 THEN 1 ELSE 0 END)
        |   + (CASE WHEN len(regexp_replace(text,'\\s','','g'))*1.0/nt BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END)
        |   AS qsc,
        |  md5($dNormText) AS fp
        |  FROM t)
        |SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  COUNT(DISTINCT fp) AS n_unique,
        |  TRUE AS unique_in_bounds,
        |  round(SUM(qsc)*1.0/COUNT(*), 4) AS avg_quality
        |FROM q GROUP BY 1, 2""".stripMargin
    },

    "q53_line_dedup" -> dLineDedupSql("documents"),

    // Line dedup over the multi-line fixture: real split/df/reassembly
    // (interior drops, within-doc repeats kept, blank-line and
    // trailing-newline round trips) — paths the newline-free sf
    // documents never reach.
    "q61_line_dedup_multiline" ->
      s"""WITH $dMultilineCte,
        |${dLineDedupSql("ml").stripPrefix("WITH ")}""".stripMargin,

    "q52_redact_pii" -> {
      import graft.llm.TextOps.{PiiEmailRe, PiiIpRe, PiiPhoneRe}
      s"""SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '$PiiEmailRe', '<EMAIL>', 'g'),
        |    '$PiiIpRe', '<IP>', 'g'),
        |    '$PiiPhoneRe', '<PHONE>', 'g') AS clean_text
        |FROM documents""".stripMargin
    },

    "q51_stratified_sample" ->
      s"""SELECT event_id, event_type FROM events
        |WHERE ${dMd5Long("event_id::VARCHAR||'s1'")} % 1000 <
        |  CASE WHEN event_type = 'view' THEN 100 ELSE 500 END""".stripMargin,

    "q50_decontamination" -> {
      val b = dMd5Long("doc_id::VARCHAR") + " % 100"
      s"""WITH sp AS (
        |  SELECT doc_id, text,
        |    CASE WHEN $b < 80 THEN 'train'
        |         WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, split,
        |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        |  FROM sp),
        |g AS (
        |  SELECT doc_id, split, unnest(CASE WHEN len(ws) >= 8
        |    THEN list_distinct(list_transform(generate_series(1, len(ws)-7),
        |      i -> ('0x'||substr(md5(array_to_string(list_slice(ws, i, i+7), ' ')),1,15))::BIGINT))
        |    ELSE []::BIGINT[] END) AS h
        |  FROM w)
        |SELECT t.doc_id, e.doc_id AS eval_id, COUNT(*) AS n_shared
        |FROM g t JOIN g e ON t.h = e.h
        |WHERE t.split = 'train' AND e.split = 'test'
        |GROUP BY 1, 2""".stripMargin
    },

    "q43_hash_split" -> {
      val b = dMd5Long("doc_id::VARCHAR") + " % 100"
      s"""SELECT doc_id, $b AS bucket,
        |  CASE WHEN $b < 80 THEN 'train'
        |       WHEN $b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin
    },

    "q41_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type <> 'purchase'),
        |r AS (
        |  SELECT user_id, ts, MAX(event_id) AS last_purchase_id,
        |         epoch_ms(ts) AS last_purchase_ts
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
        |       r.last_purchase_id, r.last_purchase_ts
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    // The full pipeline mirrored stage-for-stage: quality >= 3 filter
    // (the q24 quality arithmetic), ROW_NUMBER exact-dedup survivor per
    // normalized fingerprint, then the q20 minhash-pair ground truth +
    // q37 recursive closure over the EXACT-DEDUPED set, survivors out.
    "q40_corpus_pipeline" ->
      s"""WITH RECURSIVE
        |$dCorpusSurvivorCtes
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM surv""".stripMargin,

    // q77: the whole training-data recipe end-to-end — corpus pipeline
    // survivors → deterministic train split → greedy 512-token packing —
    // one oracle over the composition of three individually-gated
    // stages (q40, q43, q65).
    "q77_training_manifest" -> {
      val trainPred = dMd5Long("doc_id::VARCHAR") + " % 100 < 80"
      s"""WITH RECURSIVE
        |$dCorpusSurvivorCtes,
        |tr AS (SELECT doc_id, text FROM surv WHERE $trainPred),
        |pd AS (
        |  SELECT shard, doc_id, nt,
        |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS pos
        |  FROM (SELECT ${dMd5Long("doc_id::VARCHAR")} % 8 AS shard, doc_id,
        |          CAST(COALESCE(len(string_split_regex(text, '\\s+')), 0) AS BIGINT) AS nt
        |        FROM tr)),
        |pst AS (
        |  SELECT shard, doc_id, nt, pos, CAST(1 AS BIGINT) AS seq_no, nt AS fill
        |  FROM pd WHERE pos = 1
        |  UNION ALL
        |  SELECT pd.shard, pd.doc_id, pd.nt, pd.pos,
        |    CASE WHEN pst.fill + pd.nt > 512 THEN pst.seq_no + 1 ELSE pst.seq_no END,
        |    CASE WHEN pst.fill + pd.nt > 512 THEN pd.nt ELSE pst.fill + pd.nt END
        |  FROM pst JOIN pd ON pd.shard = pst.shard AND pd.pos = pst.pos + 1)
        |SELECT shard, doc_id, nt AS n_tokens, seq_no, fill - nt AS "offset"
        |FROM pst""".stripMargin
    },

    // q78: the incremental-admission chain replayed with brute-force
    // exact Jaccard over the corpus ∪ batch-survivors union — cross
    // pairs drop batch docs, within-batch pairs feed the recursive
    // closure. NOT EXISTS (not NOT IN) for the fingerprint anti-join so
    // null fingerprints match Spark's null-never-equal anti-join.
    "q78_incremental_dedup" -> {
      val bucket = s"${dMd5Long("doc_id::VARCHAR")} % 100"
      s"""WITH RECURSIVE
        |c AS (SELECT doc_id, text FROM documents WHERE $bucket < 70),
        |b AS (SELECT doc_id, text, n_chars FROM documents WHERE $bucket >= 70),
        |bx AS (SELECT doc_id, text, n_chars, fpr FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fpr ORDER BY doc_id) AS rn
        |  FROM (SELECT *, md5($dNormText) AS fpr FROM b)) WHERE rn = 1),
        |cf AS (SELECT DISTINCT md5($dNormText) AS fpr FROM c),
        |bn AS (SELECT doc_id, text, n_chars FROM bx
        |  WHERE NOT EXISTS (SELECT 1 FROM cf WHERE cf.fpr = bx.fpr)),
        |u AS (SELECT doc_id, text FROM c UNION ALL SELECT doc_id, text FROM bn),
        |${dShingleCtes("u")},
        |hh AS (SELECT DISTINCT doc_id, ${dMd5Long("t")} % ${graft.llm.MinHashLsh.P} AS h FROM sh),
        |$dJaccardTail,
        |prs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.8),
        |sym AS (SELECT doc_a AS x, doc_b AS y FROM prs
        |        UNION ALL SELECT doc_b, doc_a FROM prs),
        |rem AS (SELECT * FROM bn WHERE NOT EXISTS (
        |  SELECT 1 FROM sym JOIN c ON c.doc_id = sym.y WHERE sym.x = bn.doc_id)),
        |bp AS (SELECT doc_a, doc_b FROM prs
        |  WHERE doc_a IN (SELECT doc_id FROM rem)
        |    AND doc_b IN (SELECT doc_id FROM rem)),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM bp UNION SELECT doc_b, doc_a FROM bp),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM rem
        |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)""".stripMargin
    },

    // Exact ground truth over raw char 5-grams (the engine hashes them;
    // no collisions at sf scale, same contract as q21).
    "q39_dedup_char_ngram" ->
      s"""WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(text) - 4, 0)),
        |    i -> substr(text, i, 5))) AS gs
        |  FROM documents),
        |hh AS (SELECT doc_id, unnest(gs) AS h FROM g),
        |$dJaccardTail
        |SELECT doc_a, doc_b, i AS n_shared, n_a, n_b, jaccard
        |FROM j WHERE jaccard >= 0.8""".stripMargin,

    "q32_dedup_simhash" ->
      s"""WITH $dSimhashCtes
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b2.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b2 ON a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.simhash, b2.simhash)) <= 3""".stripMargin,

    "q28_session_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
        |g AS (
        |  SELECT user_id, ms,
        |    ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
        |  FROM e),
        |s AS (
        |  SELECT user_id, ms,
        |    SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM g)
        |SELECT user_id, MIN(ms) AS session_start_ms,
        |  MAX(ms) + 1800000 AS session_end_ms, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, seq""".stripMargin,

    "q70_json_props" ->
      """SELECT event_type,
        |  COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1""".stripMargin,

    // q69's oracle is the WINDOW formulation — equality proves the
    // bounded-heap aggregate keeps exactly the rows the sort would.
    "q69_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn <= 3""".stripMargin,

    // q76: the oracle is the NAIVE range join — equality proves the
    // bucketed 3-probe rewrite loses and duplicates nothing.
    "q76_interval_join" ->
      """WITH e AS (SELECT user_id AS key, event_id, epoch_ms(ts) AS ms FROM events)
        |SELECT a.key, a.event_id AS a_id, b.event_id AS b_id,
        |  a.ms AS ts_a, b.ms AS ts_b, b.ms - a.ms AS gap_ms
        |FROM e a JOIN e b
        |  ON a.key = b.key AND a.event_id < b.event_id
        |  AND abs(a.ms - b.ms) <= 120000""".stripMargin,

    // The salted join's oracle is the PLAIN join — equality proves the
    // salt/replicate/drop dance is semantics-free.
    "q66_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS type_users
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.user_id, d.type_users
        |FROM events e JOIN dim d USING (event_type)""".stripMargin,

    "q67_tumbling_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
        |  event_type, COUNT(*) AS n_events,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // A 2h/1h sliding window containing ts starts at floor_hour(ts) and
    // floor_hour(ts) - 1h — two shifted tumbling buckets unioned.
    "q68_sliding_window" ->
      """WITH b AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS h,
        |    event_type, value FROM events),
        |w AS (
        |  SELECT h AS ws, event_type, value FROM b
        |  UNION ALL
        |  SELECT h - 3600000 AS ws, event_type, value FROM b)
        |SELECT ws AS window_start_ms, event_type, COUNT(*) AS n_events,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM w GROUP BY 1, 2""".stripMargin,

    // Chained keep-first-within-horizon via recursive CTE: iteration N's
    // working table holds each key's Nth kept event; the recursive arm
    // finds the earliest event strictly beyond kept_ts + horizon (min ts,
    // then min event_id for ties — the same (ts, event_id) order the
    // engine's secondary sort uses). No window functions in the
    // recursive arm (join + GROUP BY only) for recursive-CTE portability.
    "q58_stream_dedup_horizon" ->
      """WITH RECURSIVE ev AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
        |k AS (
        |  SELECT e.user_id, e.ts_ms, MIN(e.event_id) AS event_id
        |  FROM ev e
        |  JOIN (SELECT user_id, MIN(ts_ms) AS m FROM ev GROUP BY 1) f
        |    ON e.user_id = f.user_id AND e.ts_ms = f.m
        |  GROUP BY 1, 2
        |  UNION ALL
        |  SELECT e2.user_id, e2.ts_ms, MIN(e2.event_id) AS event_id
        |  FROM ev e2
        |  JOIN (SELECT k.user_id, MIN(e.ts_ms) AS m
        |        FROM k JOIN ev e
        |          ON e.user_id = k.user_id AND e.ts_ms > k.ts_ms + 900000
        |        GROUP BY 1) n
        |    ON e2.user_id = n.user_id AND e2.ts_ms = n.m
        |  GROUP BY 1, 2)
        |SELECT event_id, user_id, ts_ms FROM k""".stripMargin
  )
}
