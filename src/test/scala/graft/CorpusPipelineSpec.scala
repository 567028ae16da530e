package graft

import org.apache.spark.sql.functions._
import graft.jobs.CorpusPipeline

class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // quality >= 3: >= 20 tokens, low punctuation, english stopwords, sane
  // token lengths
  private val good = "the quick brown fox jumps over the lazy dog and " +
    "runs far away into the deep dark forest where nobody ever goes"

  test("pipeline filters low quality, collapses exact and near duplicates") {
    val docs = Seq(
      (1L, good),
      (2L, good.toUpperCase), // exact dup of 1 after normalization
      (3L, good.replace("lazy", "sleepy")), // near dup of 1 (one-word edit)
      (4L, "completely different content about spark query engines and " +
        "columnar execution with vectorized operators for the modern data stack"),
      (5L, "short junk"), // fails the quality filter
      (6L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) !!!! " * 3) // punct
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val kept = CorpusPipeline.run(docs, col("doc_id"), col("text"),
      minQuality = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // 2 collapses into 1 (exact), 3 collapses into 1 (near), 5/6 filtered
    assert(kept == Set(1L, 4L))
  }

  test("pipeline preserves the input schema for downstream consumers") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = CorpusPipeline.run(docs, col("doc_id"), col("text"))
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.count() > 0 && out.count() <= docs.count())
  }
}
