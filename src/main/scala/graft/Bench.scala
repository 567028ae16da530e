package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Measurement notes:
  *  - Each query is materialized through the built-in `noop` sink, which
  *    consumes every row AND every column — unlike `count()`, which lets
  *    Catalyst prune the whole projection away and under-measures scan +
  *    project cost (round-1 verdict finding).
  *  - LOAD ROBUSTNESS (round-4 verdict): each query runs
  *    SPARK_GRAFT_BENCH_ITERS times (default 3) and the per-query number
  *    reported in `queries` is the MEDIAN; `queries_min` carries the
  *    per-query minimum so a contended machine shows up as median >> min
  *    instead of as a phantom regression. Iteration is outermost (pass
  *    over all queries, repeat) so JIT/cache warmth is comparable across
  *    queries, and SparkEntry memos are cleared per pass so shared
  *    intermediates (q20 -> q37/q38) are re-measured each pass.
  *  - GA-pipeline throughput at synthetic scale (round-4 verdict): the
  *    151-row GA fixture measures plan latency, not engine throughput, so
  *    the bench also runs the full GA pipeline on
  *    SPARK_GRAFT_GA_SCALE_HITS (default 2,000,000) generated hits,
  *    SPARK_GRAFT_GA_SCALE_ITERS times (default 5 — the first passes
  *    carry codegen/JIT warmup, see the inline rationale), and reports
  *    `ga_scale` {hits, sec (= sec_warm), sec_cold (first pass),
  *    sec_warm (median of the rest), sec_min, sec_all, hits_per_sec,
  *    hits_per_sec_max}. Set hits to 0 to skip.
  *  - Failures are NOT swallowed: a failing query records `-1` in the
  *    per-query map, is listed in `errors`, and flips the exit code to 1,
  *    so a regression can never look like a speedup.
  *  - The JSON line is printed to stdout AND written to
  *    SPARK_GRAFT_BENCH_OUT (default ./bench_out.json), so a truncated
  *    log tail can't lose a query's recorded time (round-5 verdict).
  */
object Bench {
  /** Fixed-cost CPU calibration probe (round-8 verdict: every
    * comparable query drifted 1.24–1.56× slower round-over-round,
    * including code-untouched ones — the signature of a busier/slower
    * box, but unprovable from the record alone). A constant xorshift
    * loop has no plan, no IO, no GC churn: its wall time moves ONLY
    * with the machine, so future rounds can divide query drift by
    * calibration drift and see what is environment vs regression.
    * Two arms: single-thread (per-core speed) and all-cores (the
    * contention a 32-thread local[32] suite actually competes under).
    */
  @volatile private var calibSink = 0L // defeats dead-code elimination
  private def burn(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L; var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }
  private def calibrate(): (Double, Double, Int) = {
    val Iters = 400000000L
    calibSink ^= burn(Iters / 20) // JIT warm the loop itself
    val t0 = System.nanoTime()
    calibSink ^= burn(Iters)
    val single = (System.nanoTime() - t0) / 1e9
    val p = Runtime.getRuntime.availableProcessors
    val t1 = System.nanoTime()
    val threads = (1 to p).map(_ => new Thread(() => { calibSink ^= burn(Iters) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val par = (System.nanoTime() - t1) / 1e9
    (single, par, p)
  }

  /** Short single-thread calibration TICK (~0.1 s) — run immediately
    * before each ga_scale pass. The round-9 record shows why: one pass
    * of five took 220.8 s (2.4× the COLD pass on identical code) and
    * dragged the reported warm median from ~12 s to 35.3 s; the
    * start/end calibration probes showed the box ~16% slower early in
    * the run, i.e. external contention, but per-pass validity was
    * unprovable from the record. The tick is that proof: a constant CPU
    * loop moves only with the machine, so a pass whose tick is >20%
    * above the run's best tick ran on a contended box and is DISCARDED
    * from the warm median (recorded in `sec_all`/`ticks`/`valid` so
    * nothing hides). */
  private def calibTick(): Double = {
    val Iters = 40000000L
    val t0 = System.nanoTime()
    calibSink ^= burn(Iters)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val gaScaleHits = sys.env.getOrElse("SPARK_GRAFT_GA_SCALE_HITS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup (no benchmark data touched — a throwaway
    // synthetic parquet under /tmp): without it the alphabetically-first
    // queries absorb seconds of JIT + first-use machinery cost (parquet
    // reader, hash-agg/join/window codegen, AQE) and distort per-query
    // numbers — q01 measured ~2.5 s of warmup on top of ~0.5 s of work.
    val warmDir = java.nio.file.Files.createTempDirectory("graft_warm").toString
    spark.range(200000).selectExpr("id", "id % 97 AS k", "rand(7) AS v")
      .write.mode("overwrite").parquet(warmDir)
    val warm = spark.read.parquet(warmDir)
    warm.filter("v > 0.1").groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
      .join(warm.select("k").distinct(), "k")
      .selectExpr("k", "s", "row_number() OVER (ORDER BY s) AS rn")
      .write.format("noop").mode("overwrite").save()
    // the warmup dataset is throwaway — don't accumulate it in /tmp
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))

    // upper-middle median: conservative for even counts, exact for odd
    def median(xs: List[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    var errors = Set.empty[String]

    // Calibration runs BEFORE ga_scale/queries (pristine JVM, no Spark
    // heap yet) and AGAIN at the end (under the suite's accumulated GC
    // pressure + any box drift during the ~5 min run); both land in the
    // record so drift WITHIN a run is visible too.
    val (calib1t, calibNt, calibThreads) = calibrate()

    // GA throughput at synthetic scale (same plan as tools/BenchGaScale).
    // Runs BEFORE the query sweep: r7 measured the same unchanged
    // pipeline at 6.2 → 9.6 → 12.2 s as the suite in front of it grew
    // 115 → 138 → 153 queries — accumulated JVM/GC pressure, not a
    // regression. Heading the run keeps the headline comparable across
    // rounds regardless of suite size.
    // Median-of-N like the queries (round-5 verdict: a single contended
    // pass recorded 52k hits/s vs 94-126k on identical code) — the
    // median is the headline, the max pass shows the contention spread.
    // Five passes, not three: the first 1-2 passes carry whole-stage
    // codegen + optimizer-rule JIT for the 267-column plan (measured
    // 19/10/7/7/7 s on identical code, ProfExtOverhead), so a 3-pass
    // median still lands on a warmup pass; with five it reflects the
    // warm steady state a long-running cluster job actually sees.
    val gaScaleIters =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_GA_SCALE_ITERS", "5").toInt)
    val gaScaleJson =
      if (gaScaleHits <= 0) "null"
      else try {
        val visitors = math.max(1L, gaScaleHits / 50)
        // Calibration-gated passes (round-9 verdict #1): each pass is
        // preceded by a tick; passes whose tick is >20% above the run's
        // best tick ran contended and don't count toward the warm
        // median. Extra passes (up to +3) replace discarded ones, so a
        // noisy box still yields gaScaleIters CLEAN passes when the
        // contention is transient.
        val maxPasses = gaScaleIters + 3
        var ticks = List.empty[Double]
        var secs = List.empty[Double]
        def validMask(): List[Boolean] = {
          val minTick = ticks.min
          ticks.map(_ <= minTick * 1.2)
        }
        while (secs.length < maxPasses &&
               (secs.isEmpty || validMask().count(identity) < gaScaleIters)) {
          spark.catalog.clearCache()
          val tick = calibTick()
          val hits = graft.tools.BenchGaScale.syntheticHits(spark, gaScaleHits, visitors)
          val history = graft.jobs.GaPipeline.loadHistory(spark, "/nonexistent/_scale_hist")
          val t0 = System.nanoTime()
          val out = graft.jobs.GaPipeline.run(hits, history, "2019-09-23")
          Seq(out.sessions, out.pageviews, out.events, out.products,
            out.transactions, out.items)
            .foreach(_.write.format("noop").mode("overwrite").save())
          secs = secs :+ (System.nanoTime() - t0) / 1e9
          ticks = ticks :+ tick
        }
        val valid = validMask()
        // Cold and warm are SEPARATE fields (round-7 verdict: folding the
        // cold first pass into one median made an improved warm floor
        // read as a regression round-over-round). `sec_cold` is the first
        // pass (codegen/JIT for the 267-col plan), `sec_warm` the median
        // of the remaining VALID passes — the steady state a long-running
        // job on a quiet box sees, and the headline `sec`. If contention
        // never let up (no valid warm pass), fall back to all warm passes
        // — the `valid` array in the record shows the run was dirty.
        val coldSec = secs.head
        val warmValid = secs.zip(valid).zipWithIndex
          .collect { case ((s, true), i) if i > 0 => s }
        val warmPasses =
          if (warmValid.nonEmpty) warmValid
          else if (secs.length > 1) secs.tail else secs
        val warmSec = median(warmPasses)
        val bestSec = secs.min
        // Locale.ROOT: the f interpolator is locale-sensitive — a
        // comma-decimal default locale would emit invalid JSON
        def d2(t: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))
        def d3(t: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
        val allSec = secs.map(d2).mkString("[", ",", "]")
        val tickJson = ticks.map(d3).mkString("[", ",", "]")
        val validJson = valid.map(_.toString).mkString("[", ",", "]")
        s"""{"hits":$gaScaleHits,"iterations":${secs.length},"sec":${d2(warmSec)},"sec_cold":${d2(coldSec)},"sec_warm":${d2(warmSec)},"sec_min":${d2(bestSec)},"sec_all":$allSec,"ticks":$tickJson,"valid":$validJson,"n_warm_valid":${warmValid.length},"hits_per_sec":${(gaScaleHits / warmSec).toLong},"hits_per_sec_max":${(gaScaleHits / bestSec).toLong}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ga_scale FAILED: ${e.getMessage}")
        errors += "ga_scale"
        "null"
      }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to iters) {
      SparkEntry.clearMemos()
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // per-query isolation: queries that persist internal tables must
        // not leak cached state into later timings. Inside the try: an
        // exception here must record a query failure, not kill the run
        // (the r3 bench died at this line outside any handler).
        try {
          spark.catalog.clearCache()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times(name) = (System.nanoTime() - t0) / 1e9 :: times.getOrElse(name, Nil)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors += name
        }
      }
    }
    val med = names.map { case (n, _) =>
      n -> times.get(n).filter(_.nonEmpty).map(median).getOrElse(-1.0) }
    val mins = names.map { case (n, _) =>
      n -> times.get(n).filter(_.nonEmpty).map(_.min).getOrElse(-1.0) }
    def jmap(kvs: Seq[(String, Double)]) =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val errJson = errors.toList.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = med.collect { case (_, v) if v >= 0 => v }.sum
    val (calib1tEnd, calibNtEnd, _) = calibrate()
    def d2c(t: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    val calibJson =
      s"""{"sec_1t":${d2c(calib1t)},"sec_nt":${d2c(calibNt)},"sec_1t_end":${d2c(calib1tEnd)},"sec_nt_end":${d2c(calibNtEnd)},"threads":$calibThreads}"""
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","iterations":$iters,"queries":${jmap(med)},"queries_min":${jmap(mins)},"ga_scale":$gaScaleJson,"calibration":$calibJson,"errors":$errJson,"method":"noop-sink full materialization; per-query median of $iters passes (min in queries_min); calibration = fixed 400M-iter xorshift loop, 1-thread and all-cores, at start and end","sf":"$sfDir"}"""
    // The FULL record (per-query medians + mins for all queries) lands
    // in a file only: BENCH_r05/r06's stdout tail truncated mid-value —
    // a 115-entry map is larger than the driver's tail window, so the
    // official record was an unparseable fragment two rounds running.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // Stdout gets a COMPACT summary as the LAST line: suite total, query
    // count, a small headline subset of per-query medians (so the
    // driver's {"metric",...,"queries",...} contract still parses), the
    // ga_scale block, and the path to the full record.
    val headline = Seq("q01_pricing_agg", "q16_ga_sessions", "q20_dedup_minhash",
      "q26_ann_brute", "q55_bm25", "q65_sequence_packing", "q96_edit_distance_pairs",
      "q100_pagerank", "q101_containment_join", "q115_ga_transitions")
    val medMap = med.toMap
    val headlineMap = headline.flatMap(n => medMap.get(n).map(n -> _))
    val line = s"""{"metric":"total","value":$total,"unit":"sec","iterations":$iters,"n_queries":${med.size},"queries":${jmap(headlineMap)},"ga_scale":$gaScaleJson,"calibration":$calibJson,"errors":$errJson,"full_record":"$outFile","sf":"$sfDir"}"""
    println(line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
