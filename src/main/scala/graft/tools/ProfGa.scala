package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.SparkEntry
import graft.ingest.Ingest
import graft.jobs.GaPipeline

/** Scratch profiler for the GA pipeline queries: how much of q16's cost
  * is plan construction/analysis vs optimization vs execution (the
  * 267-col schema makes analyzer work non-trivial). */
object ProfGa {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(100).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      val hits = time("read (schema only)")(
        Ingest.readEnrichedHits(spark, SparkEntry.GaEnriched))
      val out = time("build plan (GaPipeline.run)")(
        GaPipeline.run(hits, GaPipeline.loadHistory(spark, "/nonexistent/_x"),
          "2019-09-23", idAlgo = "md5", persistExport = false))
      val sel = time("select projection")(out.sessions.select(
        col("fullVisitorId"), col("visitId"), col("visitNumber"),
        col("trafficSource_source"), col("touchpoints")))
      time("analyze+optimize")(sel.queryExecution.executedPlan)
      time("execute")(sel.write.format("noop").mode("overwrite").save())
      time("execute again")(sel.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
