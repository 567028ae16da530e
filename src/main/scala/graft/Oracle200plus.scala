package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Attribution, Ecommerce, Sessionization}
import graft.ingest.Ingest
import graft.functions.GaFunctions

/** One third of the DuckDB oracle registry (split from SparkEntry,
  * round-12 verdict — pure move): oracle SQL for queries q200+. The
  * shared DuckDB CTE helpers stay in [[SparkEntry]]. */
private[graft] object Oracle200plus {
  import SparkEntry._

  val m: Map[String, String] = Map(
    "q216_phrase_from_index" -> PhraseSearchOracle,

    // q264: the refused poisoned batch leaves no trace; the corrected
    // slice lands — q256's truth behind the write-time gate.
    "q264_sql_check_constraint" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_refused, TRUE AS gate_nothing_committed
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderkey % 127 = 0)
        |GROUP BY 1""".stripMargin,

    // q263: the manifest's leaf partitions = the distinct waves of the
    // base plus the inserted wave 9.
    "q263_sql_show_partitions" ->
      """SELECT 'w=' || w AS partition, TRUE AS gate_fresh
        |FROM (SELECT DISTINCT substring(o_orderpriority, 1, 1) AS w
        |      FROM orders
        |      UNION
        |      SELECT '9' AS w
        |      WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey % 211 = 0))
        |""".stripMargin,

    // q261: base rows read the evolved column as null (coalesced to 0
    // in the sum); the inserted %113 slice carries price div 10.
    "q261_sql_alter_add_column" ->
      """SELECT w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(pc) AS BIGINT) AS sum_price_cents,
        |  CAST(SUM(dc) AS BIGINT) AS sum_discount_cents,
        |  TRUE AS gate_sql_alter
        |FROM (
        |  SELECT substring(o_orderpriority, 1, 1) AS w,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |    CAST(0 AS BIGINT) AS dc
        |  FROM orders
        |  UNION ALL
        |  SELECT substring(o_orderpriority, 1, 1) AS w,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |    CAST(round(o_totalprice * 100) AS BIGINT) // 10 AS dc
        |  FROM orders WHERE o_orderkey % 113 = 0)
        |GROUP BY 1""".stripMargin,

    // q262: the log-only table facts — version 2 (bootstrap + DV
    // delete), exactly one file per wave, one DV artifact, and the
    // exact live row count (physical minus DV'd) with zero data IO.
    "q262_describe_detail" ->
      """SELECT CAST(2 AS BIGINT) AS version,
        |  CAST(5 AS BIGINT) AS n_files,
        |  CAST(1 AS BIGINT) AS n_dvs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey % 131 <> 0) AS n_rows""".stripMargin,

    // q226: the q154 series-pair CTEs + the same doubled-average-rank
    // windows and shared corr formula on the ranks.
    "q226_spearman" ->
      s"""WITH b AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS h,
        |    event_type, CAST(floor(value) AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT h, event_type, CAST(SUM(v) AS BIGINT) AS sv
        |  FROM b GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ta, b2.event_type AS tb, a.sv AS x, b2.sv AS y
        |  FROM m a JOIN m b2 ON a.h = b2.h AND a.event_type < b2.event_type),
        |r AS (
        |  SELECT ta, tb,
        |    CAST(2 * RANK() OVER (PARTITION BY ta, tb ORDER BY x)
        |      + COUNT(*) OVER (PARTITION BY ta, tb, x) - 1 AS BIGINT) AS rx,
        |    CAST(2 * RANK() OVER (PARTITION BY ta, tb ORDER BY y)
        |      + COUNT(*) OVER (PARTITION BY ta, tb, y) - 1 AS BIGINT) AS ry
        |  FROM p),
        |mm AS (
        |  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
        |    CAST(SUM(rx*ry) AS BIGINT) AS sxy, CAST(SUM(rx*rx) AS BIGINT) AS sxx,
        |    CAST(SUM(ry*ry) AS BIGINT) AS syy
        |  FROM r GROUP BY 1, 2)
        |SELECT ta, tb, n AS n_windows,
        |  ${dCorr("sx", "sy", "sxy", "sxx", "syy")} AS rho
        |FROM mm""".stripMargin,

    // q225: the q17 pageview stack grouped by (hit day, path level 1).
    "q225_serving_pageview_volume" ->
      s"""WITH ${dGaSessionCtes("")},
        |f2 AS (SELECT * FROM s WHERE body_t = 'pageview'),
        |lv AS (
        |  SELECT *, list_filter(string_split(${dPath("body_dl")}, '/'), x -> x <> '') AS parts
        |  FROM f2)
        |SELECT
        |  CAST(strftime(make_timestamp((ms // 1000) * 1000000), '%d') AS BIGINT) AS day,
        |  CASE WHEN len(parts) >= 1 THEN '/' || parts[1] ELSE '' END AS path1,
        |  CAST(COUNT(*) AS BIGINT) AS n_pageviews
        |FROM lv GROUP BY 1, 2""".stripMargin,

    // q224: the identical reflection-identity windows (cumsum + running
    // min), same floor-percentage slack/threshold.
    "q224_cusum" ->
      """WITH daily AS (
        |  SELECT event_type AS series, epoch_ms(ts) // 86400000 AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx
        |  FROM daily GROUP BY 1),
        |c AS (
        |  SELECT daily.series, d, x, n, sx,
        |    n * x - sx - (sx * 10) // 100 AS cv
        |  FROM daily JOIN tot ON daily.series = tot.series),
        |t AS (
        |  SELECT *, CAST(SUM(cv) OVER (PARTITION BY series ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tv
        |  FROM c)
        |SELECT series, CAST(d AS BIGINT) AS d, x,
        |  tv - LEAST(0, MIN(tv) OVER (PARTITION BY series ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_scaled,
        |  (tv - LEAST(0, MIN(tv) OVER (PARTITION BY series ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
        |    > (sx * 50) // 100 AS alarm
        |FROM t""".stripMargin,

    // q223: the identical ECDF cross-multiplication over per-value
    // counts; length() on both sides counts characters identically
    // (ASCII fixture; DuckDB length = code points, Spark = UTF-16 — on
    // this fixture equal, and the ORACLE is recomputed per sf).
    "q223_ks_drift" ->
      """WITH b AS (
        |  SELECT lang,
        |    source IN ('src0','src2','src4','src6','src8') AS s,
        |    CAST(length(text) AS BIGINT) AS v
        |  FROM documents),
        |c AS (
        |  SELECT lang, v,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN NOT s THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM b GROUP BY 1, 2),
        |t AS (
        |  SELECT lang, CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2
        |  FROM c GROUP BY 1 HAVING SUM(c1) > 0 AND SUM(c2) > 0),
        |r AS (
        |  SELECT lang, v,
        |    CAST(SUM(c1) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r1,
        |    CAST(SUM(c2) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r2
        |  FROM c)
        |SELECT r.lang AS "group", n1, n2,
        |  MAX(abs(r1 * n2 - r2 * n1)) AS d_num,
        |  CAST((1000000::HUGEINT * MAX(abs(r1 * n2 - r2 * n1)))
        |    // (n1::HUGEINT * n2) AS BIGINT) AS d_ppm
        |FROM r JOIN t ON r.lang = t.lang
        |GROUP BY 1, 2, 3""".stripMargin,

    // q222: HUGEINT replay of the DECIMAL(38,0) chi-square grid —
    // identical cross-multiplication, identical floor-ppm division.
    "q222_chi_square" ->
      """WITH o AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM o GROUP BY 1),
        |ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM o GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
        |g AS (SELECT lang, source, rt, ct, n
        |      FROM rt CROSS JOIN ct CROSS JOIN nn),
        |j AS (SELECT g.lang, g.source, COALESCE(o.o, 0) AS o, rt, ct, n
        |      FROM g LEFT JOIN o ON g.lang = o.lang AND g.source = o.source)
        |SELECT lang, source, o, rt, ct, n,
        |  CAST((CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
        |     * (CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
        |     * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT)
        |    AS chi2_ppm
        |FROM j""".stripMargin,

    // q221: generate_series spine + the same LOCF window (frames
    // mirrored exactly: unbounded preceding → current row).
    "q221_gap_fill" ->
      """WITH d AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
        |      FROM d GROUP BY 1),
        |s AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day
        |      FROM b),
        |j AS (SELECT s.event_type, s.day, d.n
        |      FROM s LEFT JOIN d ON s.event_type = d.event_type
        |        AND s.day = d.day)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  COALESCE(n, 0) AS n_filled,
        |  LAST_VALUE(n IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS n_ffill
        |FROM j""".stripMargin,

    // q217: the serving tree is the union of the day-22 and day-23
    // pipeline runs, so the oracle is the UNFILTERED session stack
    // (q59's shape) grouped by (date, source) — catalog == recompute.
    "q217_serving_sessions_by_source" ->
      s"""WITH ${dGaSessionCtes("")},
        |v AS (
        |  SELECT *, MIN(ms) OVER wv AS first_value
        |  FROM s WINDOW wv AS (PARTITION BY body_cid, seq)),
        |st AS (SELECT * FROM v WHERE is_new = 1),
        |${dUrlCtes("st")},
        |p AS (
        |  SELECT
        |    CAST(strftime(make_timestamp((ms // 1000) * 1000000), '%Y%m%d') AS BIGINT) AS "date",
        |    $dSourceCase AS trafficSource_source
        |  FROM u2)
        |SELECT "date", trafficSource_source,
        |  CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1, 2""".stripMargin,

    // q218: one visitor's full journey — every session row of cid-v17
    // across both days, with the md5 visit id and session ordinal.
    "q218_serving_visitor_journey" -> VisitorJourneyOracle,

    // q219: the SAME journey answered through the bloom-pruned file
    // read — identical rows (pruning lost nothing) + the all-true
    // pruning gate (q183's gate_pruned discipline).
    "q219_bloom_point_lookup" ->
      s"""SELECT *, TRUE AS gate_pruned FROM ($VisitorJourneyOracle)""",

    // q220: the RFM quintile replay — per-metric cumulative-count
    // cutoffs (smallest value covering k/5 of the mass, the q175
    // bucketing shape ×3) and the same ascending CASE scoring.
    "q220_rfm_segmentation" ->
      """WITH pc AS (
        |  SELECT o_custkey AS custkey,
        |    MAX(epoch_ms(o_orderdate) // 86400000) AS last_od,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |a AS (SELECT MAX(last_od) AS anchor FROM pc),
        |b AS (
        |  SELECT custkey, CAST(anchor - last_od AS BIGINT) AS recency_days,
        |    frequency, monetary_cents
        |  FROM pc CROSS JOIN a),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM b),
        |rcm AS (SELECT recency_days AS v, CAST(COUNT(*) OVER (ORDER BY recency_days, custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw FROM b),
        |fcm AS (SELECT frequency AS v, CAST(COUNT(*) OVER (ORDER BY frequency, custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw FROM b),
        |mcm AS (SELECT monetary_cents AS v, CAST(COUNT(*) OVER (ORDER BY monetary_cents, custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw FROM b),
        |r1 AS (SELECT MIN(v) AS c FROM rcm CROSS JOIN t WHERE cw * 5 >= tot * 1),
        |r2 AS (SELECT MIN(v) AS c FROM rcm CROSS JOIN t WHERE cw * 5 >= tot * 2),
        |r3 AS (SELECT MIN(v) AS c FROM rcm CROSS JOIN t WHERE cw * 5 >= tot * 3),
        |r4 AS (SELECT MIN(v) AS c FROM rcm CROSS JOIN t WHERE cw * 5 >= tot * 4),
        |f1 AS (SELECT MIN(v) AS c FROM fcm CROSS JOIN t WHERE cw * 5 >= tot * 1),
        |f2 AS (SELECT MIN(v) AS c FROM fcm CROSS JOIN t WHERE cw * 5 >= tot * 2),
        |f3 AS (SELECT MIN(v) AS c FROM fcm CROSS JOIN t WHERE cw * 5 >= tot * 3),
        |f4 AS (SELECT MIN(v) AS c FROM fcm CROSS JOIN t WHERE cw * 5 >= tot * 4),
        |m1 AS (SELECT MIN(v) AS c FROM mcm CROSS JOIN t WHERE cw * 5 >= tot * 1),
        |m2 AS (SELECT MIN(v) AS c FROM mcm CROSS JOIN t WHERE cw * 5 >= tot * 2),
        |m3 AS (SELECT MIN(v) AS c FROM mcm CROSS JOIN t WHERE cw * 5 >= tot * 3),
        |m4 AS (SELECT MIN(v) AS c FROM mcm CROSS JOIN t WHERE cw * 5 >= tot * 4),
        |sc AS (
        |  SELECT custkey, recency_days, frequency, monetary_cents,
        |    CAST(CASE WHEN recency_days <= r1.c THEN 1 WHEN recency_days <= r2.c THEN 2
        |         WHEN recency_days <= r3.c THEN 3 WHEN recency_days <= r4.c THEN 4
        |         ELSE 5 END AS BIGINT) AS r,
        |    CAST(CASE WHEN frequency <= f1.c THEN 1 WHEN frequency <= f2.c THEN 2
        |         WHEN frequency <= f3.c THEN 3 WHEN frequency <= f4.c THEN 4
        |         ELSE 5 END AS BIGINT) AS f,
        |    CAST(CASE WHEN monetary_cents <= m1.c THEN 1 WHEN monetary_cents <= m2.c THEN 2
        |         WHEN monetary_cents <= m3.c THEN 3 WHEN monetary_cents <= m4.c THEN 4
        |         ELSE 5 END AS BIGINT) AS m
        |  FROM b CROSS JOIN r1 CROSS JOIN r2 CROSS JOIN r3 CROSS JOIN r4
        |    CROSS JOIN f1 CROSS JOIN f2 CROSS JOIN f3 CROSS JOIN f4
        |    CROSS JOIN m1 CROSS JOIN m2 CROSS JOIN m3 CROSS JOIN m4)
        |SELECT custkey, recency_days, frequency, monetary_cents, r, f, m,
        |  r * 100 + f * 10 + m AS rfm_code
        |FROM sc""".stripMargin,

    // q230: the row-count truths the engine must answer WITHOUT
    // scanning data (gate_zero_io pins the plan shape); DuckDB counts
    // the base table directly.
    "q230_count_from_log" ->
      """SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE substring(o_orderpriority, 1, 1) IN ('1', '2'))
        |    AS n_urgent_high,
        |  TRUE AS gate_zero_io""".stripMargin,

    // q236: the delta-maintained aggregate must equal the full
    // recompute over base-minus-subjects.
    // q260: the TVF replay lands exactly q245's truth — the commit
    // history consumed batch-wise instead of streamed.
    "q260_table_changes" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT) *
        |           CASE WHEN substring(o_orderpriority, 1, 1) = '1'
        |                THEN 2 ELSE 1 END) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_tvf
        |FROM orders
        |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |  AND o_custkey % 149 <> 0
        |GROUP BY 1""".stripMargin,

    // q267: Berlin-shifted date/hour straight from the epoch millis —
    // the oracle applies the +2h CEST offset EXPLICITLY, so a Spark
    // derivation that silently assumed UTC (or shifted twice) misses
    // by two hours and hash-fails.
    "q267_ga_timezone_parity" ->
      s"""SELECT message_id AS request_id,
        |  strftime(make_timestamp(((CAST(received_at_apig AS BIGINT)
        |    // 1000) + 7200) * 1000000), '%Y%m%d') AS date_berlin,
        |  CAST(EXTRACT(hour FROM make_timestamp(((CAST(received_at_apig
        |    AS BIGINT) // 1000) + 7200) * 1000000)) AS BIGINT)
        |    AS hour_berlin,
        |  CAST(EXTRACT(minute FROM make_timestamp((CAST(received_at_apig
        |    AS BIGINT) // 1000) * 1000000)) AS BIGINT) AS minute_hit,
        |  TRUE AS gate_tz_shift, TRUE AS gate_tz_roll
        |FROM read_json('${SparkEntry.GaEnrichedFile}',
        |               format='newline_delimited',
        |               columns={message_id:'VARCHAR',
        |                        received_at_apig:'VARCHAR'})""".stripMargin,

    // q266: base + the re-keyed %127 batch, summed under the NEW
    // column name — the rename changed metadata, never values.
    "q266_sql_rename_column" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_amount_cents,
        |  TRUE AS gate_rename_meta, TRUE AS gate_rename_tt,
        |  TRUE AS gate_rename_map
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderkey % 127 = 0)
        |GROUP BY 1""".stripMargin,

    // q265: two OPTIMIZE rewrites (WHERE-scoped, then plain
    // incremental) change LAYOUT only — the hash pins content
    // unchanged; the file-identity gates ride as literals.
    "q265_sql_optimize_where" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_optimize_scope, TRUE AS gate_optimize_incremental
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q259: DELETE the %107 subjects (merge-on-read), double + move
    // the %101 customers to wave 9 — over the three-level layout; the
    // zero-padded month key survives the round trip (the value-
    // identity discipline the gates and hash pin).
    "q259_sql_multilevel_dml" ->
      """SELECT CASE WHEN o_custkey % 101 = 0 THEN '9'
        |            ELSE substring(o_orderpriority, 1, 1) END AS w,
        |  lpad(CAST(o_custkey % 3 AS VARCHAR), 2, '0') AS m,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT) *
        |           CASE WHEN o_custkey % 101 = 0 THEN 2 ELSE 1 END)
        |       AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_ml_delete, TRUE AS gate_ml_update
        |FROM orders
        |WHERE o_custkey % 107 <> 0
        |GROUP BY 1, 2""".stripMargin,

    // q258: after 12 small INSERTs of the %997 slices and one plain
    // OPTIMIZE, the table serves base + the slices — the compaction
    // changed layout, never content (the hash IS the gate).
    "q258_sql_optimize" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_sql_optimize
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderkey % 997 < 12)
        |GROUP BY 1""".stripMargin,

    // q257: the DDL lifecycle lands the same truth as q256 — base +
    // the re-keyed %127 batch — reached through CREATE/INSERT/SELECT/
    // DROP/re-CREATE as pure SQL.
    "q257_sql_create_table" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_sql_ddl
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderkey % 127 = 0)
        |GROUP BY 1""".stripMargin,

    // q256: base + the re-keyed %127 batch — the INSERT became one
    // manifest commit, so the very next read serves it.
    "q256_sql_insert" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_sql_insert
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderkey % 127 = 0)
        |GROUP BY 1""".stripMargin,

    // q255: the `VERSION AS OF 1` read replays the full pre-erasure
    // base — q242's truth through the ANSI clause on one name.
    "q255_sql_time_travel" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_sql_tt
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q254: the ANSI UPDATE serves exactly the q239 truth — doubled
    // price + the w='9' cross-partition move for the matched
    // customers.
    "q254_sql_update" ->
      """SELECT CASE WHEN o_custkey % 101 = 0 THEN '9'
        |            ELSE substring(o_orderpriority, 1, 1) END AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT) *
        |           CASE WHEN o_custkey % 101 = 0 THEN 2 ELSE 1 END)
        |       AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_sql_update
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q253: the group-pinned stream accumulates exactly the flipped
    // publishes — q233's truth, reached through offsets-are-group-
    // versions instead of a snapshot read.
    "q253_group_stream" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_group_pinned
        |FROM orders
        |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |GROUP BY 1""".stripMargin,

    // q251: the SQL DELETE serves exactly the q237 truth — base minus
    // the modular subjects — through the ANSI statement.
    "q251_sql_delete" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_mor, TRUE AS gate_gone
        |FROM orders
        |WHERE o_custkey % 89 <> 0
        |GROUP BY 1""".stripMargin,

    // q252: the ANSI MERGE serves exactly the q241 truth — matched
    // rows tripled, the same rows re-inserted under new keys.
    "q252_sql_merge" ->
      """WITH p AS (SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  o_orderkey FROM orders)
        |SELECT w, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_sql_merge
        |FROM (
        |  SELECT w, CASE WHEN o_orderkey % 113 = 0
        |                 THEN 3 * price_cents ELSE price_cents END
        |           AS price_cents FROM p
        |  UNION ALL
        |  SELECT w, price_cents FROM p WHERE o_orderkey % 113 = 0
        |)
        |GROUP BY w""".stripMargin,

    // q250: 162 versions later, the snapshot is still base minus the
    // erased subjects — checkpointing/compaction changes log SHAPE,
    // never truth; the gates are the bounded-log claims.
    "q250_log_checkpoint" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_bounded, TRUE AS gate_ckpt, TRUE AS gate_cutoff
        |FROM orders
        |WHERE o_custkey % 151 <> 0
        |GROUP BY 1""".stripMargin,

    // q237: the table minus the DV-erased subjects IS the truth every
    // read face (unified table, log count) must serve.
    "q237_dv_erasure" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_mor, TRUE AS gate_count, TRUE AS gate_gone
        |FROM orders
        |WHERE o_custkey % 89 <> 0
        |GROUP BY 1""".stripMargin,

    // q239: the update's truth — doubled price and w='9' for the
    // updated customers — reached through one DV+staged-files commit.
    "q239_dv_update" ->
      """SELECT CASE WHEN o_custkey % 101 = 0 THEN '9'
        |            ELSE substring(o_orderpriority, 1, 1) END AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT) *
        |           CASE WHEN o_custkey % 101 = 0 THEN 2 ELSE 1 END)
        |       AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_mor_u
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q249: waves 1-3 where only wave 3 carries the evolved column —
    // null-filled elsewhere, truth stated per wave.
    "q249_schema_evolution" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  CAST(SUM(CASE WHEN substring(o_orderpriority, 1, 1) = '3'
        |           THEN CAST(round(o_totalprice * 100) AS BIGINT) // 10
        |           ELSE 0 END) AS BIGINT) AS sum_discount_cents,
        |  TRUE AS gate_schema
        |FROM orders
        |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |GROUP BY 1""".stripMargin,

    // q248: the six-table erasure's claims, one row per member — the
    // contents themselves are hash-gated by the GA table queries.
    "q248_ga_group_dv_erasure" ->
      """SELECT * FROM (VALUES
        |  ('events', TRUE, TRUE, TRUE), ('items', TRUE, TRUE, TRUE),
        |  ('pageviews', TRUE, TRUE, TRUE), ('products', TRUE, TRUE, TRUE),
        |  ('sessions', TRUE, TRUE, TRUE),
        |  ('transactions', TRUE, TRUE, TRUE))
        | AS t(tpe, gate_gone, gate_zero_rewrite, gate_counts)""".stripMargin,

    // q247: after the restore the table IS waves 1-3 again — the
    // incident left only audit-log entries behind.
    "q247_restore" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_restore
        |FROM orders
        |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |GROUP BY 1""".stripMargin,

    // q246: the scripted lifecycle's expected history — operations
    // inferred from delta shapes, stated as a literal.
    "q246_table_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'bootstrap', TRUE,  FALSE, FALSE),
        |  (CAST(2 AS BIGINT), 'append',    TRUE,  FALSE, FALSE),
        |  (CAST(3 AS BIGINT), 'delete',    FALSE, FALSE, TRUE),
        |  (CAST(4 AS BIGINT), 'update',    TRUE,  FALSE, TRUE),
        |  (CAST(5 AS BIGINT), 'replace',   TRUE,  TRUE,  FALSE),
        |  (CAST(6 AS BIGINT), 'replace',   TRUE,  TRUE,  FALSE))
        | AS t(version, operation, had_adds, had_removes, had_dvs)""".stripMargin,

    // q245: waves 1-3 with wave-1 prices doubled (the replacement
    // commit), minus the DV-erased subjects — reached by replaying
    // the per-commit events of ONE catch-up batch in version order.
    "q245_cdc_commit_versions" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT) *
        |           CASE WHEN substring(o_orderpriority, 1, 1) = '1'
        |                THEN 2 ELSE 1 END) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_cv
        |FROM orders
        |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |  AND o_custkey % 149 <> 0
        |GROUP BY 1""".stripMargin,

    // q244: the clustered rewrite changes LAYOUT, never truth — base
    // minus the DV-erased subjects, grouped on the customer residue.
    "q244_optimize_zorder" ->
      """SELECT o_custkey % 8 AS g,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_zorder
        |FROM orders
        |WHERE o_custkey % 109 <> 0
        |GROUP BY 1""".stripMargin,

    // q243: base + the clean batch only — the poisoned batch was
    // refused at the commit gate and never served.
    "q243_checked_admission" ->
      """WITH p AS (SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  o_orderkey FROM orders)
        |SELECT w, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_checked
        |FROM (
        |  SELECT w, price_cents FROM p
        |  UNION ALL
        |  SELECT w, price_cents FROM p WHERE o_orderkey % 127 = 0
        |)
        |GROUP BY w""".stripMargin,

    // q242: the pinned name replays the PRE-erasure snapshot — the
    // raw base truth, no WHERE — while the live name (gate) already
    // serves the erased table.
    "q242_version_pinned_read" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_travel
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q241: matched orders replaced whole-row (tripled price), the
    // same rows re-inserted under new keys — the MERGE truth DuckDB
    // states as one UNION ALL.
    "q241_dv_merge" ->
      """WITH p AS (SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  o_orderkey FROM orders)
        |SELECT w, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_merge
        |FROM (
        |  SELECT w, CASE WHEN o_orderkey % 113 = 0
        |                 THEN 3 * price_cents ELSE price_cents END
        |           AS price_cents FROM p
        |  UNION ALL
        |  SELECT w, price_cents FROM p WHERE o_orderkey % 113 = 0
        |)
        |GROUP BY w""".stripMargin,

    // q240: base minus the erased subjects, served through the
    // group-pinned unified tables after the one-flip DV erasure.
    "q240_dv_group_erasure" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_dv_group
        |FROM orders
        |WHERE o_custkey % 103 <> 0
        |GROUP BY 1""".stripMargin,

    // q238: the converged mirror after the deletion-vector commit —
    // same truth, reached through row-level CDC with zero file churn.
    "q238_dv_change_feed" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_dv_cdc
        |FROM orders
        |WHERE o_custkey % 131 <> 0
        |GROUP BY 1""".stripMargin,

    "q236_incremental_view" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_ivm
        |FROM orders
        |WHERE o_custkey % 997 <> 0
        |GROUP BY 1""".stripMargin,

    // q235: the converged mirror must equal the base minus the erased
    // subjects — identical truth to q234, reached through the feed.
    "q235_change_feed_mirror" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_cdc
        |FROM orders
        |WHERE o_custkey % 997 <> 0
        |GROUP BY 1""".stripMargin,

    // q234: the base table minus the erased subjects IS the truth the
    // post-erasure group must serve.
    "q234_group_erasure" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_erased
        |FROM orders
        |WHERE o_custkey % 997 <> 0
        |GROUP BY 1""".stripMargin,

    // q233: only the GROUP-published waves (1–3) may appear — waves
    // 4–5 are committed to the facts table's own manifest but never
    // flipped, so a leak shows up as extra rows with null aggregates.
    "q233_group_snapshot" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_consistent
        |FROM orders
        |WHERE substring(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |GROUP BY 1""".stripMargin,

    // q232: the change feed's accumulated multiset must equal the
    // base table — DuckDB aggregates the base directly; the engine
    // side got there one commit at a time.
    "q232_manifest_change_feed" ->
      """SELECT substring(o_orderpriority, 1, 1) AS w,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  TRUE AS gate_multi_batch
        |FROM orders GROUP BY 1""".stripMargin,

    // q231: the same extrema/count truths, answered in the engine
    // with zero data IO (gate pins the plan); DuckDB reads the base.
    "q231_minmax_from_log" ->
      """SELECT (SELECT min(o_orderdate) FROM orders) AS first_order,
        |  (SELECT max(o_orderdate) FROM orders) AS last_order,
        |  (SELECT min(o_totalprice) FROM orders) AS min_price,
        |  (SELECT CAST(count(o_totalprice) AS BIGINT) FROM orders)
        |    AS n_price,
        |  (SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |     AS BIGINT) FROM orders) AS sum_price_cents,
        |  (SELECT max(o_totalprice) FROM orders
        |     WHERE substring(o_orderpriority, 1, 1) IN ('1', '2'))
        |    AS hi_max_price,
        |  TRUE AS gate_zero_io""".stripMargin,

    // q229: the same full-table-filter truth, reproduced through the
    // unified manifest table's implicit colstats pruning.
    "q229_unified_range" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_pruned
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-03-01'
        |  AND o_orderdate < TIMESTAMP '1995-06-01'
        |GROUP BY o_orderpriority""".stripMargin,

    // q227: same full-table-filter truth as q183 — the engine side
    // must reproduce it from LOG-derived stats pruning.
    "q227_skipping_from_log" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  TRUE AS gate_pruned
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-03-01'
        |  AND o_orderdate < TIMESTAMP '1995-06-01'
        |GROUP BY o_orderpriority""".stripMargin,

    // q211: the gate IS definitional — the incremental maintenance
    // must equal the one-shot brute count over the union, so the
    // oracle is literally q189's SQL.
    "q211_incremental_triangles" -> dTrianglesOneShot,

    // q200: reach-closure components (q37's pattern) + the md5 bucket
    // mirror, each scored by the identical 4m²-denominator arithmetic.
    "q200_modularity" -> {
      val hash8 = dMd5Long("node::VARCHAR") + " % 8"
      def block(membCte: String, method: String) =
        s"""SELECT p.community, p.n_nodes, p.m_intra, p.deg_sum,
          |  4 * p.m_intra * mm.m - p.deg_sum * p.deg_sum AS qc_num,
          |  tt.q_ppm, '$method' AS method
          |FROM (
          |  SELECT d.community, d.n_nodes, d.deg_sum,
          |    COALESCE(i.m_intra, 0) AS m_intra
          |  FROM (SELECT mb.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
          |      CAST(SUM(dg.deg) AS BIGINT) AS deg_sum
          |    FROM $membCte mb JOIN deg dg ON mb.node = dg.node
          |    GROUP BY 1) d
          |  LEFT JOIN (SELECT ma.community, CAST(COUNT(*) AS BIGINT) AS m_intra
          |    FROM e0 ee JOIN $membCte ma ON ee.u = ma.node
          |    JOIN $membCte mc ON ee.v = mc.node
          |    WHERE ma.community = mc.community GROUP BY 1) i
          |  USING (community)) p
          |CROSS JOIN mm
          |CROSS JOIN (
          |  SELECT CAST((1000000 * SUM(q)) // GREATEST(4 * mx.m * mx.m, 1)
          |      AS BIGINT) AS q_ppm
          |  FROM (
          |    SELECT 4 * COALESCE(i2.m_intra, 0) * mm2.m
          |        - d2.deg_sum * d2.deg_sum AS q
          |    FROM (SELECT mb2.community, CAST(SUM(dg2.deg) AS BIGINT) AS deg_sum
          |      FROM $membCte mb2 JOIN deg dg2 ON mb2.node = dg2.node
          |      GROUP BY 1) d2
          |    LEFT JOIN (SELECT ma2.community, CAST(COUNT(*) AS BIGINT) AS m_intra
          |      FROM e0 ee2 JOIN $membCte ma2 ON ee2.u = ma2.node
          |      JOIN $membCte mc2 ON ee2.v = mc2.node
          |      WHERE ma2.community = mc2.community GROUP BY 1) i2
          |    USING (community)
          |    CROSS JOIN mm mm2) q
          |  CROSS JOIN mm mx GROUP BY mx.m) tt""".stripMargin
      s"""WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (SELECT u, v FROM (
        |    SELECT CAST(a.l_partkey AS BIGINT) AS u,
        |      CAST(b.l_partkey AS BIGINT) AS v, COUNT(*) AS c
        |    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |      AND a.l_partkey < b.l_partkey
        |    GROUP BY 1, 2) t WHERE c >= 2),
        |es AS MATERIALIZED (SELECT u AS a, v AS b FROM e0
        |  UNION SELECT v, u FROM e0),
        |reach(src, dst) AS (
        |  SELECT a, a FROM es
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN es e ON r.dst = e.a),
        |comp AS MATERIALIZED (SELECT src AS node,
        |  CAST(MIN(dst) AS BIGINT) AS community FROM reach GROUP BY src),
        |nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM es),
        |h8 AS MATERIALIZED (SELECT node,
        |  CAST($hash8 AS BIGINT) AS community FROM nodes),
        |deg AS MATERIALIZED (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM es GROUP BY 1),
        |mm AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0)
        |${block("comp", "components")}
        |UNION ALL
        |${block("h8", "hash8")}""".stripMargin
    },

    // q201: the same count-of-counts reductions and Chao1/Good–Turing
    // integral forms (f2 = 0 branch mirrored).
    "q201_vocab_richness" ->
      """WITH tk AS (
        |  SELECT lang AS grp,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |tf AS (SELECT grp, tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tk GROUP BY 1, 2)
        |SELECT grp AS "group",
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS f1,
        |  CAST(COUNT(*) FILTER (WHERE n = 2) AS BIGINT) AS f2,
        |  CAST(CASE WHEN COUNT(*) FILTER (WHERE n = 2) > 0
        |    THEN (1000 * (2 * COUNT(*) * COUNT(*) FILTER (WHERE n = 2)
        |        + COUNT(*) FILTER (WHERE n = 1) * COUNT(*) FILTER (WHERE n = 1)))
        |      // (2 * COUNT(*) FILTER (WHERE n = 2))
        |    ELSE 1000 * COUNT(*) + (1000 * COUNT(*) FILTER (WHERE n = 1)
        |        * (COUNT(*) FILTER (WHERE n = 1) - 1)) // 2
        |    END AS BIGINT) AS chao1_x1000,
        |  CAST((1000000 * COUNT(*) FILTER (WHERE n = 1)) //
        |    GREATEST(SUM(n), 1) AS BIGINT) AS gt_unseen_ppm
        |FROM tf GROUP BY 1""".stripMargin,

    // q215: identical epoch-day dow and integral shares.
    "q215_dow_seasonality" ->
      """WITH c AS (
        |  SELECT event_type, ((epoch_ms(ts) // 86400000) + 3) % 7 AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt
        |  FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, c.n,
        |  CAST((1000000 * c.n) // GREATEST(t.nt, 1) AS BIGINT) AS share_ppm,
        |  abs(CAST((1000000 * c.n) // GREATEST(t.nt, 1) AS BIGINT) - 142857)
        |    AS dev_ppm
        |FROM c JOIN t USING (event_type)""".stripMargin,

    // q214: identical regexp counts (DuckDB regexp_extract_all length
    // = Spark regexp_count) and the same rounded formula.
    "q214_readability" ->
      """SELECT doc_id,
        |  GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |    AS BIGINT), 1) AS n_sents,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x <> '')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |    AS BIGINT) AS n_syllables,
        |  CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '')) > 0 THEN
        |    round(206.835
        |      - 1.015 * CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |          x -> x <> '')) AS DOUBLE)
        |        / CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)
        |      - 84.6 * CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
        |        / CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |          x -> x <> '')) AS DOUBLE), 4)
        |  END AS flesch
        |FROM documents""".stripMargin,

    // q213: per-lag aligned self-joins over the daily table, shared
    // exact Pearson order; the lag axis comes from generate_series.
    "q213_lead_lag" -> {
      s"""WITH daily AS (
        |  SELECT event_type AS series, epoch_ms(ts) // 86400000 AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |xs AS (SELECT d, y AS xv FROM daily WHERE series = 'signup'),
        |ys AS (SELECT d AS dy, y AS yv FROM daily WHERE series = 'purchase'),
        |lg AS (SELECT unnest(generate_series(-7, 7)) AS lag),
        |mo AS (
        |  SELECT lg.lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
        |    CAST(SUM(xv * yv) AS BIGINT) AS sxy,
        |    CAST(SUM(xv * xv) AS BIGINT) AS sxx,
        |    CAST(SUM(yv * yv) AS BIGINT) AS syy
        |  FROM lg LEFT JOIN xs ON TRUE
        |  JOIN ys ON ys.dy = xs.d + lg.lag
        |  GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
        |  ${dCorr("sx", "sy", "sxy", "sxx", "syy")} AS r
        |FROM mo""".stripMargin
    },

    // q212: identical per-user leads (events ordered by (ts, event_id)
    // — unique, so LEAD is total) and the same (n DESC, trigram) top-10.
    "q212_behavior_trigrams" ->
      """WITH tg AS (
        |  SELECT event_type AS e1,
        |    LEAD(event_type, 1) OVER w AS e2,
        |    LEAD(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
        |FROM tg WHERE e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1, e2, e3
        |LIMIT 10""".stripMargin,

    // q210: identical md5 assignment, relative-horizon post split,
    // ppm cell means and integer difference of differences.
    "q210_diff_in_diff" -> {
      val treat = dMd5Long("user_id::VARCHAR") + " % 2 = 0"
      s"""WITH ud AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |hz AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
        |cells AS (
        |  SELECT $treat AS treated,
        |    d >= d0 + (d1 - d0 + 1) // 2 AS post,
        |    CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(y) AS BIGINT) AS sum_y
        |  FROM ud CROSS JOIN hz GROUP BY 1, 2),
        |cm AS (SELECT treated, post, n_obs, sum_y,
        |    CAST((1000000 * sum_y) // GREATEST(n_obs, 1) AS BIGINT)
        |      AS mean_ppm
        |  FROM cells),
        |did AS (SELECT
        |    (MAX(CASE WHEN treated AND post THEN mean_ppm END)
        |     - MAX(CASE WHEN treated AND NOT post THEN mean_ppm END))
        |    - (MAX(CASE WHEN NOT treated AND post THEN mean_ppm END)
        |     - MAX(CASE WHEN NOT treated AND NOT post THEN mean_ppm END))
        |    AS did_ppm
        |  FROM cm)
        |SELECT cm.*, did.did_ppm FROM cm CROSS JOIN did""".stripMargin
    },

    // q208/q209: identical rank windows and integral ratios.
    "q208_revenue_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1),
        |j AS (SELECT c.c_nationkey AS grp, r.rev_cents AS v
        |  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey),
        |rk AS (SELECT grp, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v)
        |      AS BIGINT) AS i
        |  FROM j)
        |SELECT CAST(grp AS BIGINT) AS "group",
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(v) AS BIGINT) AS total,
        |  CAST((CAST(1000000 AS HUGEINT) *
        |      (2 * SUM(CAST(i AS HUGEINT) * v) - (COUNT(*) + 1) * SUM(CAST(v AS HUGEINT)))) //
        |    GREATEST(CAST(COUNT(*) AS HUGEINT) * SUM(CAST(v AS HUGEINT)), 1)
        |    AS BIGINT) AS gini_ppm
        |FROM rk GROUP BY 1""".stripMargin,

    "q209_trimmed_mean" ->
      """WITH b AS (SELECT l_returnflag AS grp,
        |    CAST(round(l_quantity, 0) AS BIGINT) AS v
        |  FROM lineitem),
        |rk AS (SELECT grp, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v)
        |      AS BIGINT) AS i,
        |    CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM b),
        |kk AS (SELECT grp, v, i, n, (n * 10) // 100 AS k FROM rk)
        |SELECT grp AS "group", n, CAST(k AS BIGINT) AS n_trim,
        |  CAST(SUM(v) AS BIGINT) AS sum_kept,
        |  CAST((1000000 * SUM(v)) // GREATEST(COUNT(*), 1) AS BIGINT)
        |    AS mean_ppm
        |FROM kk WHERE i > k AND i <= n - k
        |GROUP BY 1, 2, 3""".stripMargin,

    // q207: the engine's OWN constant table interpolated (one source
    // of truth for the Benford expectations), identical integral ppm.
    "q207_benford" -> {
      val consts = graft.operators.Profiling.BenfordPpm.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, ${p})" }.mkString(", ")
      s"""WITH ex(digit, exp_ppm) AS (VALUES $consts),
        |dg AS (SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM lineitem
        |  WHERE CAST(round(l_extendedprice * 100, 0) AS BIGINT) > 0),
        |ob AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        |  FROM dg GROUP BY 1),
        |nt AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS nt FROM ob),
        |pd AS (SELECT ex.digit, COALESCE(ob.n_obs, 0) AS n_obs,
        |    CAST(ex.exp_ppm AS BIGINT) AS exp_ppm,
        |    CAST((1000000 * COALESCE(ob.n_obs, 0)) // GREATEST(nt.nt, 1)
        |      AS BIGINT) AS obs_ppm
        |  FROM ex LEFT JOIN ob ON ex.digit = ob.digit CROSS JOIN nt)
        |SELECT CAST(digit AS BIGINT) AS digit, n_obs, obs_ppm, exp_ppm,
        |  abs(obs_ppm - exp_ppm) AS dev_ppm,
        |  (SELECT CAST(SUM(abs(obs_ppm - exp_ppm)) // 2 AS BIGINT) FROM pd)
        |    AS tvd_ppm
        |FROM pd""".stripMargin
    },

    // q206: the shared NB score chain + mirrored top/bottom rank
    // windows (descending ranks tie-broken by doc_id ascending on the
    // top side and doc_id DESCENDING on the bottom side, so the two
    // rankings are exact mirrors).
    "q206_dpo_pairs" -> {
      s"""WITH ${dNbScoredCtes()},
        |src AS (SELECT sp.doc_id, sp.score_ppm, d.source
        |  FROM sp JOIN documents d USING (doc_id)),
        |rk AS (SELECT doc_id, score_ppm, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rt,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY score_ppm ASC, doc_id DESC) AS BIGINT) AS rb,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM src),
        |ch AS (SELECT source, rt AS pair_rank, doc_id AS chosen_id,
        |    score_ppm AS chosen_score
        |  FROM rk WHERE rt <= LEAST(10, n // 2)),
        |rj AS (SELECT source, rb AS pair_rank, doc_id AS rejected_id,
        |    score_ppm AS rejected_score
        |  FROM rk WHERE rb <= LEAST(10, n // 2))
        |SELECT source, pair_rank, chosen_id, chosen_score, rejected_id,
        |  rejected_score, chosen_score - rejected_score AS margin,
        |  chosen_score - rejected_score > 0 AS gate_margin
        |FROM ch JOIN rj USING (source, pair_rank)""".stripMargin
    },

    // q204: q189's brute triangle listing + degrees + the identical
    // integral coefficient.
    "q204_clustering_coef" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS MATERIALIZED (SELECT u, v FROM (
        |      SELECT CAST(a.l_partkey AS BIGINT) AS u,
        |        CAST(b.l_partkey AS BIGINT) AS v, COUNT(*) AS c
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2) t WHERE c >= 2),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e) t GROUP BY 1),
        |tri AS (SELECT ab.u AS x, ab.v AS y, bc.v AS z
        |        FROM e ab JOIN e bc ON ab.v = bc.u
        |        JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
        |tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri) t GROUP BY 1)
        |SELECT d.node, d.deg, COALESCE(tn.n, 0) AS n_triangles,
        |  CAST(CASE WHEN d.deg >= 2
        |    THEN (1000000 * 2 * COALESCE(tn.n, 0)) // (d.deg * (d.deg - 1))
        |    ELSE 0 END AS BIGINT) AS coef_ppm
        |FROM deg d LEFT JOIN tn USING (node)""".stripMargin,

    // q205: directed stub moments + the shared exact Pearson order.
    "q205_assortativity" -> {
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (SELECT u, v FROM (
        |      SELECT CAST(a.l_partkey AS BIGINT) AS u,
        |        CAST(b.l_partkey AS BIGINT) AS v, COUNT(*) AS c
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2) t WHERE c >= 2),
        |deg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) t
        |  GROUP BY 1),
        |st AS (SELECT da.deg AS du, db.deg AS dv
        |  FROM (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0) d
        |  JOIN deg da ON d.u = da.node JOIN deg db ON d.v = db.node),
        |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(du) AS BIGINT) AS sx, CAST(SUM(dv) AS BIGINT) AS sy,
        |    CAST(SUM(du * dv) AS BIGINT) AS sxy,
        |    CAST(SUM(du * du) AS BIGINT) AS sxx,
        |    CAST(SUM(dv * dv) AS BIGINT) AS syy
        |  FROM st)
        |SELECT n, sx, sy, sxy, sxx, syy,
        |  ${dCorr("sx", "sy", "sxy", "sxx", "syy")} AS r
        |FROM mo""".stripMargin
    },

    // q203: identical lower-median ranks ((n+1)//2 in (value, day)
    // order) and Long flag comparisons.
    "q203_mad_outliers" ->
      """WITH daily AS (
        |  SELECT event_type AS series, epoch_ms(ts) // 86400000 AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |r1 AS (SELECT series, d, y,
        |    ROW_NUMBER() OVER (PARTITION BY series ORDER BY y, d) AS rn,
        |    COUNT(*) OVER (PARTITION BY series) AS n
        |  FROM daily),
        |med AS (SELECT series,
        |    CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN y END) AS BIGINT) AS med
        |  FROM r1 GROUP BY 1),
        |wd AS (SELECT dl.series, dl.d, dl.y, m.med,
        |    abs(dl.y - m.med) AS dev
        |  FROM daily dl JOIN med m USING (series)),
        |r2 AS (SELECT series, d, dev,
        |    ROW_NUMBER() OVER (PARTITION BY series ORDER BY dev, d) AS rn,
        |    COUNT(*) OVER (PARTITION BY series) AS n
        |  FROM wd),
        |mad AS (SELECT series,
        |    CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS BIGINT) AS mad
        |  FROM r2 GROUP BY 1)
        |SELECT w.series, CAST(w.d AS BIGINT) AS d, w.y, w.med, m2.mad,
        |  w.dev > 3 * m2.mad AS is_outlier
        |FROM wd w JOIN mad m2 USING (series)""".stripMargin,

    // q202: same duel stream, same first-two-per-pair pivot (outcome
    // as the final tie-break), identical marginal-product kappa.
    "q202_judgment_agreement" -> {
      s"""WITH ${dDuelsCte()},
        |j AS (SELECT LEAST(w, l) AS pa, GREATEST(w, l) AS pb,
        |    CAST(w = LEAST(w, l) AS INT) AS o, okey, ln, s, q
        |  FROM duel),
        |r AS (SELECT pa, pb, o,
        |    ROW_NUMBER() OVER (PARTITION BY pa, pb
        |      ORDER BY okey, ln, s, q, o) AS rn
        |  FROM j),
        |p AS (SELECT pa, pb,
        |    MAX(CASE WHEN rn = 1 THEN o END) AS r1,
        |    MAX(CASE WHEN rn = 2 THEN o END) AS r2
        |  FROM r WHERE rn <= 2 GROUP BY 1, 2),
        |cells AS (SELECT
        |    CAST(COUNT(*) AS BIGINT) AS n_units,
        |    CAST(COUNT(*) FILTER (WHERE r1 = 1 AND r2 = 1) AS BIGINT) AS a,
        |    CAST(COUNT(*) FILTER (WHERE r1 = 1 AND r2 = 0) AS BIGINT) AS b,
        |    CAST(COUNT(*) FILTER (WHERE r1 = 0 AND r2 = 1) AS BIGINT) AS c,
        |    CAST(COUNT(*) FILTER (WHERE r1 = 0 AND r2 = 0) AS BIGINT) AS d
        |  FROM p WHERE r2 IS NOT NULL)
        |SELECT n_units, a, b, c, d,
        |  CAST((1000000 * (a + d)) // GREATEST(n_units, 1) AS BIGINT)
        |    AS po_ppm,
        |  CAST(CASE WHEN n_units * n_units -
        |      ((a + b) * (a + c) + (c + d) * (b + d)) > 0
        |    THEN (1000000 * (n_units * (a + d) -
        |      ((a + b) * (a + c) + (c + d) * (b + d))))
        |      // (n_units * n_units -
        |      ((a + b) * (a + c) + (c + d) * (b + d)))
        |    ELSE 0 END AS BIGINT) AS kappa_ppm
        |FROM cells""".stripMargin
    },

    // q228: q101's brute-force truth over the df-CAPPED gram sets —
    // the oracle applies the identical df ≤ 200 filter before
    // containment, so the stop-gram recall trade is itself hash-gated.
    "q228_containment_capped" ->
      s"""WITH ${dShingleCtes()},
        |hh0 AS (SELECT doc_id, t AS h FROM sh),
        |gdf AS (SELECT h, count(*) AS df FROM hh0 GROUP BY 1),
        |hh AS (SELECT doc_id, hh0.h FROM hh0 JOIN gdf USING (h)
        |       WHERE df <= 200),
        |sz AS (SELECT doc_id, count(*) AS n FROM hh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM hh a JOIN hh b ON a.h = b.h AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b, i, sa.n AS n_a, sb.n AS n_b
        |  FROM inter JOIN sz sa ON sa.doc_id = doc_a
        |             JOIN sz sb ON sb.doc_id = doc_b)
        |SELECT doc_a, doc_b, i AS n_shared, n_a, n_b,
        |  round(i * 1.0 / n_a, 4) AS containment
        |FROM j WHERE i * 5 >= n_a * 4""".stripMargin
  )
}
