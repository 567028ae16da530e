package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.llm.MinHashLsh
import graft.sources.Tables

/** Scratch profiler: cacheSets on/off for verifiedPairs, and the
  * jaccardJoin stage costs, at a given sf dir. */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]",
      shufflePartitions = Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(1000000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { r =>
      println(s"-- round $r --")
      time("verifiedPairs cache=false")(
        MinHashLsh.verifiedPairs(docs, col("doc_id"), col("text"), 0.8)
          .write.format("noop").mode("overwrite").save())
      time("verifiedPairs cache=true")(
        MinHashLsh.verifiedPairs(docs, col("doc_id"), col("text"), 0.8,
          cacheSets = true)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      time("jaccardJoin 4/5")(
        MinHashLsh.jaccardJoin(docs, col("doc_id"), col("text"), 4, 5)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
