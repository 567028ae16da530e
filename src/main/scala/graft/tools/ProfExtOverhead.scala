package graft.tools

import org.apache.spark.sql.SparkSession

import graft.jobs.GaPipeline

/** Scratch A/B: GA-pipeline throughput with vs without the graft
  * session extensions (optimizer rule + planner strategy + SQL
  * functions) — isolates extension overhead on very large plans. */
object ProfExtOverhead {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val passes = 3
    def run(withExt: Boolean): List[Double] = {
      val b = SparkSession.builder()
        .master("local[32]")
        .appName(s"ext=$withExt")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
      val b2 = if (withExt) b.config("spark.sql.extensions", "graft.GraftExtensions") else b
      val spark = b2.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // warmup
      spark.range(1000000).selectExpr("sum(id) s")
        .write.format("noop").mode("overwrite").save()
      val times = (1 to passes).map { _ =>
        spark.catalog.clearCache() // honest per-pass cost (Bench parity)
        val hits = BenchGaScale.syntheticHits(spark, n, n / 50)
        val history = GaPipeline.loadHistory(spark, "/nonexistent/_x")
        val t0 = System.nanoTime()
        val out = GaPipeline.run(hits, history, "2019-09-23")
        Seq(out.sessions, out.pageviews, out.events, out.products,
          out.transactions, out.items)
          .foreach(_.write.format("noop").mode("overwrite").save())
        (System.nanoTime() - t0) / 1e9
      }.toList
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      times
    }
    val withExt = run(withExt = true)
    val withoutExt = run(withExt = false)
    println(s"[prof] WITH extensions:    ${withExt.map(t => f"$t%.2f").mkString(", ")}")
    println(s"[prof] WITHOUT extensions: ${withoutExt.map(t => f"$t%.2f").mkString(", ")}")
  }
}
