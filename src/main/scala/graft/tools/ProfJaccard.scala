package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.GraftSession
import graft.llm.MinHashLsh
import graft.sources.Tables

/** Scratch profiler: per-stage cost of jaccardJoin at a given sf dir.
  *
  * NOTE: the stage pipeline below is a SNAPSHOT of
  * [[MinHashLsh.jaccardJoinFromSets]]'s internals (copied so each stage
  * can be materialized separately) — if the production filter stack
  * changes, re-sync this copy before trusting its per-stage numbers.
  * The `full jaccardJoin` timing always runs the real implementation. */
object ProfJaccard {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]",
      shufflePartitions = Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    spark.range(1000000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    val (p, q) = (4, 5)
    (1 to 2).foreach { r =>
      println(s"-- round $r --")
      val sets = MinHashLsh.hashSets(docs, col("doc_id"), col("text"))
      time("sets.count")(sets.count())
      val tok = sets.select(col("doc_id"), explode(col("hs")).as("h"))
      time("tok.count")(tok.count())
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      def intDiv(x: org.apache.spark.sql.Column, d: Int) = floor(x / d).cast("long")
      val prefixLen = col("n") - intDiv(col("n") * p + (q - 1), q) + 1
      val prefix = tok
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= prefixLen)
        .select("doc_id", "h", "rn", "n")
      time("prefix.count")(prefix.count())
      val l = prefix.toDF("doc_a", "h", "rn_a", "n_a")
      val rr = prefix.toDF("doc_b", "h", "rn_b", "n_b")
      val alpha = floor(((col("n_a") + col("n_b")) * p + (p + q - 1)) / (p + q)).cast("long")
      val cand = l.join(rr, Seq("h"))
        .where(col("doc_a") < col("doc_b") &&
          col("n_b") * q >= col("n_a") * p && col("n_a") * q >= col("n_b") * p &&
          least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + 1 >= alpha)
        .select("doc_a", "doc_b").distinct()
      time("cand.count")(cand.count())
      time("full jaccardJoin")(
        MinHashLsh.jaccardJoin(docs, col("doc_id"), col("text"), p, q)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
