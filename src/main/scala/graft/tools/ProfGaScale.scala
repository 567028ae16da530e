package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.jobs.GaPipeline
import graft.operators.Ecommerce

/** Scratch profiler: per-stage cost of the GA pipeline on synthetic
  * hits (which stage bounds throughput at scale). */
object ProfGaScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.builder(master = "local[32]",
      shufflePartitions = Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val hits = BenchGaScale.syntheticHits(spark, n, n / 50)
    time("generate only")(hits.write.format("noop").mode("overwrite").save())
    val sess = GaPipeline.sessionized(hits)
    time("sessionized")(sess.write.format("noop").mode("overwrite").save())
    val derived = GaPipeline.withDerivedColumns(sess)
    time("+derived (attribution)")(derived.write.format("noop").mode("overwrite").save())
    val expl = Ecommerce.explodeProducts(derived)
    time("+explode")(expl.write.format("noop").mode("overwrite").save())
    val export = GaPipeline.exportTable(expl
      .withColumn("product_revenue", lit(null).cast("double")))
    time("+export projection")(export.write.format("noop").mode("overwrite").save())
    time("full run (6 outputs)") {
      val out = GaPipeline.run(hits,
        GaPipeline.loadHistory(spark, "/nonexistent/_x"), "2019-09-23")
      Seq(out.sessions, out.pageviews, out.events, out.products,
        out.transactions, out.items)
        .foreach(_.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
