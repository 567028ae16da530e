package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time one registered query by name: `runMain graft.tools.ProfQuery
  * <query> [sfDir] [passes]` — warm JVM, noop sink, memos cleared per
  * pass (the Bench measurement protocol for a single query). */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local()
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    spark.range(100).write.format("noop").mode("overwrite").save()
    for (i <- 1 to passes) {
      SparkEntry.clearMemos()
      spark.catalog.clearCache()
      // the bench protocol: staged fixtures are SETUP, timed apart —
      // without this the first measured pass carries the fixture build
      // and is not comparable to the bench's per-query numbers
      val s0 = System.nanoTime()
      SparkEntry.setup.get(name).foreach(_(spark, dir))
      val setupSec = (System.nanoTime() - s0) / 1e9
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        (if (setupSec > 0.005) f" (setup ${setupSec}%.2f s)" else ""))
    }
    spark.stop()
  }
}
