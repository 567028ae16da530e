package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.llm.MinHashLsh
import graft.sources.Tables

/** A/B the PPJoin verify shape on the q96 corpus: (a) pair-distinct
  * BEFORE the set-verify joins (current), vs (b) verify the duplicated
  * candidates and distinct the (tiny) surviving output. */
object ProbeVerifyShape {
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
      val sets = docs.select(col("doc_id"),
          call_function("char_ngram_hash_set", col("text"), lit(5)).as("hs"),
          length(col("text")).cast("long").as("aux"))
        .where(size(col("hs")) > 0).persist()
      sets.count()
      val tok = sets.select(col("doc_id"), size(col("hs")).as("n"),
        explode(col("hs")).as("h"), col("aux"))
      val dfreq = tok.select("doc_id", "h")
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      def intDiv(x: org.apache.spark.sql.Column, d: Int) = floor(x / d).cast("long")
      val prefixLen = col("n") - intDiv(col("n") * p + (q - 1), q) + 1
      val prefix = tok.join(dfreq, Seq("h"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= prefixLen)
        .select("doc_id", "h", "rn", "n", "aux").persist()
      prefix.count()
      val l = prefix.toDF("doc_a", "h", "rn_a", "n_a", "aux_a")
      val rr = prefix.toDF("doc_b", "h", "rn_b", "n_b", "aux_b")
      val alpha = floor(((col("n_a") + col("n_b")) * p + (p + q - 1)) / (p + q)).cast("long")
      val candBand = l.join(rr, Seq("h"))
        .where(col("doc_a") < col("doc_b") &&
          col("n_b") * q >= col("n_a") * p && col("n_a") * q >= col("n_b") * p &&
          least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + 1 >= alpha &&
          abs(col("aux_a") - col("aux_b")).cast("double") <
            lit(0.25005) * greatest(col("aux_a"), col("aux_b")).cast("double"))
      def verify(cand: org.apache.spark.sql.DataFrame) = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
        .withColumn("n_shared",
          call_function("sorted_intersect_size", col("ha"), col("hb")).cast("long"))
        .withColumn("n_a", size(col("ha")).cast("long"))
        .withColumn("n_b", size(col("hb")).cast("long"))
        .withColumn("jaccard", round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 4))
        .where(col("jaccard") >= p.toDouble / q)
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "jaccard")
      val shapeA = verify(candBand.select("doc_a", "doc_b").distinct())
      val shapeB = verify(candBand.select("doc_a", "doc_b")).distinct()
      time("shapeA distinct-then-verify")(
        shapeA.write.format("noop").mode("overwrite").save())
      time("shapeB verify-then-distinct")(
        shapeB.write.format("noop").mode("overwrite").save())
      time("shapeA again")(
        shapeA.write.format("noop").mode("overwrite").save())
      time("shapeB again")(
        shapeB.write.format("noop").mode("overwrite").save())
      println("counts: A=" + shapeA.count() + " B=" + shapeB.count())
      prefix.unpersist(); sets.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
