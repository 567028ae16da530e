package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series trend + forecast-backtest diagnostics over a daily
  * counter — the monitoring pair behind "is this metric drifting, and
  * would the naive forecast have caught it?": an OLS slope prices the
  * trend, a seasonal-naive backtest (ŷ_d = y_{d−7}) prices the
  * predictability, and both are pure ratios of exact Long moment sums
  * (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) — integer numerator and
  * denominator, emitted as an integral ppm division), so the whole
  * report hash-gates. The trend complement of the spike detector
  * (q105 bursts) and the distribution monitor (q143 drift).
  *
  * Scale shape: one integer groupBy to the (series, day)-bounded daily
  * table, then one lag window + one moment aggregation per series —
  * map-combinable after the window; no collect, no doubles.
  */
object Trend {

  /** Lead–lag cross-correlation between two daily counters — "does x
    * lead y by k days?": for each lag in ±`maxLag`, Pearson r between
    * x(d) and y(d+lag) over the days where BOTH are observed, from
    * exact Long moment sums through the shared
    * [[IntStats.corrFromSums]] expression order (so every per-lag r
    * hash-gates; the reader picks the peak). One self-join per lag
    * over the day-bounded daily table — 2·maxLag+1 cheap passes, no
    * windows. `(lag, n_days, r)`. */
  def leadLag(events: DataFrame, series: Column, day: Column,
              xSeries: String, ySeries: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 0 && maxLag <= 60, s"maxLag: $maxLag")
    val daily = events
      .select(series.as("series"), day.cast("long").as("d"))
      .groupBy("series", "d").agg(count(lit(1)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val xs = daily.filter(col("series") === xSeries)
      .select(col("d"), col("y").as("xv"))
    val ys = daily.filter(col("series") === ySeries)
      .select(col("d").as("dy"), col("y").as("yv"))
    val lags = (-maxLag to maxLag).map { k =>
      xs.join(ys, col("dy") === col("d") + k)
        .agg(count(lit(1)).as("n"),
          sum("xv").as("sx"), sum("yv").as("sy"),
          sum(col("xv") * col("yv")).as("sxy"),
          sum(col("xv") * col("xv")).as("sxx"),
          sum(col("yv") * col("yv")).as("syy"))
        .select(lit(k.toLong).as("lag"), col("n").as("n_days"),
          IntStats.corrFromSums(col("n"), col("sx"), col("sy"),
            col("sxy"), col("sxx"), col("syy")).as("r"))
    }
    // lags with zero aligned days carry no information — dropped, so
    // the output is one row per OBSERVABLE lag
    val out = lags.reduce(_ unionByName _)
      .filter(col("n_days") > 0L)
      .localCheckpoint(true)
    daily.unpersist()
    out
  }

  /** Robust outlier days per series — median/MAD flags (Hampel's
    * identifier): mean±σ rules let the outliers they hunt inflate
    * their own threshold; the median and the median absolute
    * deviation have 50% breakdown, so a burst cannot hide itself.
    * Exact integers throughout: the LOWER median (the value at rank
    * ⌈n/2⌉ in (value, day) order — a real data value, no averaging),
    * and the flag compares |y − med| > k·MAD directly in Longs.
    * Two rank windows over the (series, day)-bounded daily table.
    *
    * `(series, d, y, med, mad, is_outlier)` — every observed day,
    * flagged. A constant series has MAD 0, so ANY deviation flags
    * (the documented Hampel-at-zero behavior). */
  /** CUSUM changepoint detection per daily series — the SEQUENTIAL
    * drift alarm completing the family (moments: Drift/q143; shape:
    * KS/q223; level shift over time: this). Page '54's one-sided
    * positive CUSUM, S_i = max(0, S_{i-1} + x_i − μ − k): a sustained
    * upward shift accumulates; noise resets. All integers — values are
    * SCALED BY n (the series' day count) so the mean needs no
    * division: c_i = n·x_i − Σx exactly centers, the slack and alarm
    * threshold are floor-percentages of Σx (k = n·(kPct% of μ) =
    * ⌊Σx·kPct/100⌋, same for h).
    *
    * The max(0,·) recursion is NOT folded row-by-row: by the classic
    * reflection identity S_i = T_i − min(0, min_{j≤i} T_j) with
    * T = cumsum(c − k), so TWO ordered windows per series express it
    * — no sequential state, no UDF, same plan shape batch or 100 TB.
    * `(series, d, x, s_scaled, alarm)`. */
  def cusum(events: DataFrame, series: Column, day: Column,
            kPct: Int = 10, hPct: Int = 50): DataFrame = {
    require(kPct >= 0 && hPct > 0, s"bad cusum params: $kPct/$hPct")
    val daily = events
      .select(series.as("series"), day.cast("long").as("d"))
      .groupBy("series", "d").agg(count(lit(1)).as("x"))
    val tot = daily.groupBy("series")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val w = Window.partitionBy("series").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(tot), "series")
      .withColumn("_c",
        col("n") * col("x") - col("sx") - expr(s"(sx * ${kPct}L) div 100L"))
      .withColumn("_t", sum("_c").over(w))
      .withColumn("s_scaled",
        col("_t") - least(lit(0L), min("_t").over(w)))
      .withColumn("alarm", col("s_scaled") > expr(s"(sx * ${hPct}L) div 100L"))
      .select(col("series"), col("d"), col("x"), col("s_scaled"), col("alarm"))
  }

  def madOutliers(events: DataFrame, series: Column, day: Column,
                  k: Int = 3): DataFrame = {
    val daily = events
      .select(series.as("series"), day.cast("long").as("d"))
      .groupBy("series", "d").agg(count(lit(1)).as("y"))
    def lowerMedian(df: DataFrame, value: Column, out: String) = {
      val w = Window.partitionBy("series").orderBy(value, col("d"))
      df.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy("series")))
        .withColumn(out,
          max(when(col("_rn") === expr("(_n + 1L) div 2L"), value))
            .over(Window.partitionBy("series")))
        .drop("_rn", "_n")
    }
    val withMed = lowerMedian(daily, col("y"), "med")
      .withColumn("dev", abs(col("y") - col("med")))
    lowerMedian(withMed, col("dev"), "mad")
      .select(col("series"), col("d"), col("y"), col("med"),
        col("mad").as("mad"),
        (col("dev") > lit(k.toLong) * col("mad")).as("is_outlier"))
  }

  /** `(series, n_days, slope_ppm_per_day, n_backtest, mae_ppm)`:
    * per-series OLS slope over (day-index, count) in count-ppm per
    * day, and the mean absolute error of the seasonal-naive(7)
    * forecast over days whose d−7 ancestor was observed (gaps skip —
    * backtest pairs require an exact 7-day lag). */
  def dailyTrendBacktest(events: DataFrame, series: Column,
                         day: Column, seasonDays: Int = 7): DataFrame = {
    val daily = events
      .select(series.as("series"), day.cast("long").as("d0"))
      .groupBy("series", "d0").agg(count(lit(1)).as("y"))
      // x-translation leaves the slope unchanged; re-basing each series
      // at day 0 keeps the moment sums small (epoch-day x-values would
      // push n·Σx² toward Long range on long/huge series)
      .withColumn("d", col("d0") -
        min("d0").over(Window.partitionBy("series")))
    val w = Window.partitionBy("series").orderBy("d")
    val lagged = daily
      .withColumn("pd", lag("d", seasonDays).over(w))
      .withColumn("py", lag("y", seasonDays).over(w))
      .withColumn("err",
        when(col("pd") === col("d") - seasonDays, abs(col("y") - col("py"))))
    lagged.groupBy("series").agg(
        count(lit(1)).as("n_days"),
        sum("d").as("sx"), sum("y").as("sy"),
        sum(col("d") * col("y")).as("sxy"),
        sum(col("d") * col("d")).as("sxx"),
        count(col("err")).as("n_backtest"),
        sum(col("err")).as("serr"))
      .select(col("series"), col("n_days"),
        expr("""CASE WHEN n_days * sxx - sx * sx > 0L
                THEN (1000000L * (n_days * sxy - sx * sy))
                     div (n_days * sxx - sx * sx)
                ELSE 0L END""").as("slope_ppm_per_day"),
        col("n_backtest"),
        expr("(1000000L * coalesce(serr, 0L)) div greatest(n_backtest, 1L)")
          .as("mae_ppm"))
  }
}
