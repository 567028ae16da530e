package graft.tools

import org.apache.spark.sql.functions._

/** Scratch branch-wise timing for q91 (BigramLm.score): full score vs
  * a fold-free variant (plain double sum — order-dependent, timing
  * only) vs the cached tf materialization alone, isolating the cost of
  * the bit-stability sorted fold the verdict asked about.
  */
object ProfQ91 {
  def main(args: Array[String]): Unit = {
    import graft.llm.{BigramLm, TextOps}
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 3) {
      time("full") {
        BigramLm.score(docs, col("doc_id"), col("text"))
          .write.format("noop").mode("overwrite").save()
      }
      time("tf_only") {
        docs.select(col("doc_id"), explode(BigramLm.bigrams(col("text"))).as("bg"))
          .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
          .write.format("noop").mode("overwrite").save()
      }
      time("plain_sum") { // the fold replaced by sum(c): NOT bit-stable
        val base = docs.select(col("doc_id"), col("text").as("_text"))
        val tf = base.select(col("doc_id"),
            explode(BigramLm.bigrams(col("_text"))).as("bg"))
          .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
          .persist()
        val c2 = tf.groupBy(col("bg")).agg(sum(col("tf")).as("c2"))
        val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
          .agg(sum(col("c2")).as("c1"))
        val v = base.select(explode(TextOps.lowerTokens(col("_text"))).as("t"))
          .agg(countDistinct(col("t")).as("v"))
        tf.join(c2, "bg")
          .join(c1, substring_index(col("bg"), " ", 1) === col("w1"))
          .crossJoin(broadcast(v))
          .withColumn("c", col("tf").cast("double") *
            log((col("c2").cast("double") + BigramLm.AddK) /
              (col("c1").cast("double") + (col("v").cast("double") * BigramLm.AddK))))
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n_bigrams"), sum(col("c")).as("s"))
          .write.format("noop").mode("overwrite").save()
        tf.unpersist()
      }
    }
    spark.stop()
  }
}
