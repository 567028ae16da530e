package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
