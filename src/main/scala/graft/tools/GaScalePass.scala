package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.jobs.GaPipeline

/** One ga_scale measurement process — the fresh-JVM arm of the bench's
  * GA-pipeline throughput block, with the telemetry the round-10 record
  * proved the single-thread tick cannot provide.
  *
  * Round-10 evidence: five in-process passes of the UNCHANGED pipeline
  * spread 12.2–86.7 s while every pass's single-thread calibration tick
  * was flat (0.075–0.076 s). A flat tick rules OUT per-core CPU
  * contention, so the spread lives in something a one-thread
  * allocation-free loop never touches: GC, memory bandwidth, or IO.
  * This tool measures exactly those per pass:
  *
  *  - `gc_sec` / `gc_n`: stop-the-world collector time/count deltas
  *    across the pass (sum over all GarbageCollectorMXBeans) — the
  *    direct test of the "8 GiB heap, 32 threads, 267-col rows" GC
  *    hypothesis.
  *  - `heap_mb`: live heap after the pass (post-GC drift shows leak-
  *    shaped pressure; flat shows churn).
  *  - `tick_all`: an ALL-CORES xorshift burn (per-core seconds,
  *    normalized by thread count) — memory-bus/SMT contention from
  *    OTHER processes shows here while the 1-thread tick stays flat.
  *  - `tick_1t`: the round-10 single-thread tick, kept for continuity.
  *
  * Run modes: the bench forks `iters` SEPARATE JVMs of this main with
  * `withinJvmPasses=2` and keeps each JVM's LAST pass — pass 1 absorbs
  * whole-stage-codegen/JIT for the 267-col plan, pass 2 is the warm
  * steady state, and a fresh JVM per sample means no cross-sample heap
  * or code-cache coupling (the round-10 confound). Standalone, a larger
  * `withinJvmPasses` replays the old in-process protocol with the new
  * telemetry for A/B diagnosis.
  *
  * Output: one `GASCALE_PASS {json}` line per pass on stdout, then
  * `GASCALE_DONE`. No aggregation here — the parent owns statistics.
  */
object GaScalePass {

  @volatile private var sink = 0L
  private def burn(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L; var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }
  /** Single-thread tick (~75 ms on an idle core). */
  private def tick1t(): Double = {
    val t0 = System.nanoTime(); sink ^= burn(40000000L)
    (System.nanoTime() - t0) / 1e9
  }
  /** All-cores tick: every core burns the same loop concurrently;
    * reports wall seconds (== per-core seconds when the box is ours
    * alone; rises with any cross-process contention the 1t tick can
    * hide behind an idle sibling core). */
  private def tickAll(): Double = {
    val p = Runtime.getRuntime.availableProcessors
    val t0 = System.nanoTime()
    val ts = (1 to p).map(_ => new Thread(() => { sink ^= burn(40000000L) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** MEMORY-PRESSURE tick (round-12 verdict #1): the CPU spin loops
    * above are allocation-free and cache-resident, so they are BLIND
    * to the contamination that actually moved the round-12 record —
    * memory-bandwidth/page-cache pressure from a sibling process with
    * ~100 GB of live heap (every wall number 65% up, every CPU tick
    * flat, `valid: true` on all five passes). This tick walks a fixed
    * 256 MB long array in a pseudo-random order: each access is a
    * likely cache+TLB miss, so its wall time moves with memory-bus
    * and page-cache pressure the spin loop cannot sense. The array is
    * allocated ONCE (outside any measurement) and the traversal
    * order is deterministic, so the tick itself is fixed work — like
    * the CPU tick, it can only move with the machine. */
  private lazy val memArr: Array[Long] = {
    val a = new Array[Long](32 * 1024 * 1024) // 256 MB of longs
    var i = 0
    while (i < a.length) { a(i) = 0x9E3779B97F4A7C15L * i; i += 1 }
    a
  }
  private def tickMem(): Double = {
    val a = memArr
    val mask = a.length - 1
    var x = 0x2545F4914F6CDD1DL; var acc = 0L; var i = 0
    val n = 4 * 1024 * 1024 // 4M dependent random accesses
    val t0 = System.nanoTime()
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc ^= a(((x >>> 3) & mask).toInt)
      i += 1
    }
    sink ^= acc
    (System.nanoTime() - t0) / 1e9
  }

  private def gcTotals(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionTime).sum, beans.map(_.getCollectionCount).sum)
  }

  def main(args: Array[String]): Unit = {
    val hits = args.headOption.map(_.toLong).getOrElse(2000000L)
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = args.lift(2).getOrElse("32")
    val spark: SparkSession = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val visitors = math.max(1L, hits / 50)
    val history = GaPipeline.loadHistory(spark, "/nonexistent/_scale_hist")
    def d(t: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(t))
    tickMem(): Unit // touch every page once OUTSIDE any measurement
    (1 to passes).foreach { i =>
      spark.catalog.clearCache()
      val t1 = tick1t(); val ta = tickAll(); val tm = tickMem()
      val (gcMs0, gcN0) = gcTotals()
      val hitsDf = BenchGaScale.syntheticHits(spark, hits, visitors)
      val t0 = System.nanoTime()
      val out = GaPipeline.run(hitsDf, history, "2019-09-23")
      Seq(out.sessions, out.pageviews, out.events, out.products,
        out.transactions, out.items)
        .foreach(_.write.format("noop").mode("overwrite").save())
      val sec = (System.nanoTime() - t0) / 1e9
      val (gcMs1, gcN1) = gcTotals()
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
      // println goes through sbt's log wrapper when run via sbt; the
      // parent greps the GASCALE_PASS prefix either way
      println(s"""GASCALE_PASS {"pass":$i,"sec":${d(sec)},""" +
        s""""gc_sec":${d((gcMs1 - gcMs0) / 1e3)},"gc_n":${gcN1 - gcN0},""" +
        s""""heap_mb":$heapMb,"tick_1t":${d(t1)},"tick_all":${d(ta)},""" +
        s""""tick_mem":${d(tm)},"hits":$hits}""")
    }
    println("GASCALE_DONE")
    spark.stop()
  }
}
