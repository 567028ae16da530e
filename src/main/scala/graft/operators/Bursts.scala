package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Burst detection over event-time series — the anomaly flag of an
  * ingest monitor: bucket events into fixed windows per series, then
  * compare each bucket against the trailing baseline (mean + k·σ over
  * the preceding `lookback` OBSERVED buckets).
  *
  * "Observed" is deliberate: buckets with zero events produce no row,
  * so the baseline frame skips over silent gaps rather than counting
  * them as zeros — a series resuming after an outage is judged against
  * its last active period, not against the outage. If zeros-as-data
  * semantics are wanted (resumption SHOULD alarm after silence), join
  * the counts onto a generated series×bucket spine first and feed the
  * zero-filled frame to the same windows; the arithmetic is unchanged.
  *
  * Determinism: the window sums run over INTEGER counts (exact, order
  * independent); mean/variance derive from those integer sums with a
  * fixed expression tree (population variance via sumsq/n − mean², the
  * one-pass identity), so the doubles are reproducible by the oracle
  * with no fold-order caveat at all. Buckets with fewer than
  * `lookback` predecessors emit a null z (no baseline, never a fake
  * flag).
  *
  * Shape: one corpus-sized map-combinable bucket count, then windows
  * over the SERIES×bucket table — dimension-sized (series × time
  * range), not event-sized; the event table itself is never windowed.
  */
object Bursts {

  /** `(series, bucket_start_ms, n, z, is_burst)` with z rounded to 4.
    * `bucket` = event-time bucket of `ts` truncated to `bucketExpr`
    * (caller supplies e.g. date_trunc("hour", ts)). */
  def detect(events: DataFrame, series: Column, bucket: Column,
             lookback: Int = 6, k: Double = 2.0): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2: $lookback")
    val counts = events
      .groupBy(series.as("series"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("_cnt", count(col("n")).over(w))
      .withColumn("_sum", sum(col("n")).over(w))
      .withColumn("_sumsq", sum(col("n") * col("n")).over(w))
      .withColumn("_mean", col("_sum").cast("double") / lookback)
      .withColumn("_var",
        col("_sumsq").cast("double") / lookback - col("_mean") * col("_mean"))
      // clamp negative float dust before the sqrt
      .withColumn("_sd", sqrt(greatest(col("_var"), lit(0.0))))
      .withColumn("z",
        when(col("_cnt") < lookback, lit(null).cast("double"))
          .otherwise(round((col("n").cast("double") - col("_mean")) /
            greatest(col("_sd"), lit(1e-9)), 4)))
      .withColumn("is_burst",
        when(col("_cnt") < lookback, lit(null).cast("boolean"))
          .otherwise(col("n").cast("double") >
            col("_mean") + lit(k) * col("_sd")))
      .select(col("series"), unix_millis(col("bucket")).as("bucket_start_ms"),
        col("n"), col("z"), col("is_burst"))
  }
}
