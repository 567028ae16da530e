package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-interval (tumbling) event-time aggregation — the third window
  * family next to the gap sessions ([[StreamingSessionize]]) and the
  * dedup horizons ([[StreamingDedup]]). One plan serves batch and
  * streaming: on a stream, pass a watermark and run append mode — each
  * window emits exactly once, after the watermark passes its end; state
  * is one aggregation buffer per open (window, key), evicted on emit.
  *
  * The per-window stats are deliberately ORDER-INDEPENDENT (count, min,
  * max): a floating-point sum would differ across partitionings/retries
  * and could never hash-match the oracle. For money-like sums use the
  * fixed-point decimal pattern (q01/q16).
  */
object StreamingWindows {

  /** Per (tumbling window, event_type): count + value extrema. `events`
    * needs an event-time `ts` and columns `event_type`, `value`. Batch
    * semantics are oracle-gated (q67, DuckDB `time_bucket` mirror —
    * hour-granularity buckets align at the epoch in both engines);
    * streaming emit-once is spec-gated. */
  def tumblingStats(events: DataFrame, duration: String = "1 hour",
                    watermark: Option[String] = None): DataFrame =
    slidingStats(events, duration, duration, watermark)

  /** Sliding (overlapping) variant: each event lands in
    * duration/slide windows, every window start aligned to a multiple
    * of `slide` since the epoch — the same alignment the DuckDB mirror
    * reproduces by unioning shifted `time_bucket`s (q68). `slide ==
    * duration` degenerates to tumbling (q67). */
  def slidingStats(events: DataFrame, duration: String, slide: String,
                   watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"),
        col("min_value"), col("max_value"))
  }

  /** Per-window distribution monitor — the streaming form of the
    * IntStats discipline ([[graft.operators.IntStats]]): mean/variance
    * of `value` per (tumbling window, event_type), carried as INTEGER
    * moment sums over the milli-quantized value. The sums are
    * associative + commutative longs, so the streaming aggregation
    * buffer merges exactly across triggers/retries and the batch twin
    * hash-matches a DuckDB oracle (q143) — a floating mean/var
    * aggregate could do neither. mean/var are derived per emitted row.
    *
    * This is the drift alarm a pipeline hangs on its ingest: a window
    * whose mean_mv/var_mv jumps against the trailing baseline flags a
    * schema or upstream change. The CARRIED sums stay in int64 (Σmv²
    * is safe to ~1e6 rows per window-key at |value| ≤ 1e3; re-scale the
    * quantization for wider domains); the variance DERIVES in double
    * space ((Σx² − (Σx)²/n)/(n−1)) because the n·Σx² integer product
    * would wrap at realistic volumes — same rationale as q145's
    * baseline math.
    */
  def windowMoments(events: DataFrame, duration: String = "1 hour",
                    watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    val d = (c: Column) => c.cast("double")
    src
      .select(col("ts"), col("event_type"),
        floor(col("value") * 1000).cast("long").as("mv"))
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("mv").as("sum_mv"),
        sum(col("mv") * col("mv")).as("sum_mv2"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_mv"), col("sum_mv2"),
        // NO round(): identical longs through identical IEEE division
        // yield bit-identical doubles in both engines, while round(_, 6)
        // on a ~1e9-magnitude variance sits past double precision and
        // the engines' rounding ALGORITHMS (BigDecimal vs float-scale)
        // disagree in the last digit. Rounding is for libm ops (ln);
        // + - * / sqrt are correctly-rounded and need none.
        (d(col("sum_mv")) / d(col("n_events"))).as("mean_mv"),
        when(col("n_events") < 2, lit(null).cast("double"))
          .otherwise(
            (d(col("sum_mv2")) -
              d(col("sum_mv")) * d(col("sum_mv")) / d(col("n_events"))) /
              d(col("n_events") - 1)).as("var_mv"))
  }
}
