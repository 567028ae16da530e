package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.llm.MinHashLsh
import graft.sources.Tables

/** Per-stage cost of q96 (char-5-gram PPJoin at 1/2 + bounded
  * levenshtein verify) at a given sf dir. */
object ProbeQ96 {
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
    val (p, q) = (1, 2)
    (1 to 2).foreach { r =>
      println(s"-- round $r --")
      val sets0 = MinHashLsh.charNgramHashSets(docs, col("doc_id"), col("text"), 5)
      time("sets.count")(sets0.count())
      val sets = sets0.persist()
      val tok = sets.select(col("doc_id"), size(col("hs")).as("n"),
        explode(col("hs")).as("h"))
      time("tok.count")(tok.count())
      val dfreq = tok.select("doc_id", "h")
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
      time("dfreq.count")(dfreq.count())
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      def intDiv(x: org.apache.spark.sql.Column, d: Int) = floor(x / d).cast("long")
      val prefixLen = col("n") - intDiv(col("n") * p + (q - 1), q) + 1
      val prefix = tok.join(dfreq, Seq("h"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= prefixLen)
        .select("doc_id", "h", "rn", "n").persist()
      time("prefix.count")(prefix.count())
      val l = prefix.toDF("doc_a", "h", "rn_a", "n_a")
      val rr = prefix.toDF("doc_b", "h", "rn_b", "n_b")
      val alpha = floor(((col("n_a") + col("n_b")) * p + (p + q - 1)) / (p + q)).cast("long")
      val lens = docs.select(col("doc_id").as("doc_a"),
        length(col("text")).cast("long").as("la"))
      val lensB = docs.select(col("doc_id").as("doc_b"),
        length(col("text")).cast("long").as("lb"))
      val candRaw = l.join(rr, Seq("h"))
        .where(col("doc_a") < col("doc_b") &&
          col("n_b") * q >= col("n_a") * p && col("n_a") * q >= col("n_b") * p &&
          least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + 1 >= alpha)
      val candBand = candRaw.join(broadcast(lens), "doc_a")
        .join(broadcast(lensB), "doc_b")
        .where(abs(col("la") - col("lb")).cast("double") <
          lit(0.25005) * greatest(col("la"), col("lb")).cast("double"))
      time("candBand.count")(candBand.count())
      time("candRaw.count")(candRaw.count())
      val cand = candRaw.select("doc_a", "doc_b").distinct()
      time("cand.distinct.count")(cand.count())
      time("full q96")(graft.SparkEntry.queries("q96_edit_distance_pairs")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      prefix.unpersist(); sets.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
