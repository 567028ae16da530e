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

  test("scrub fails loudly on a null id instead of silently dropping the row") {
    val docs = Seq((java.lang.Long.valueOf(1L), "some text"),
      (null.asInstanceOf[java.lang.Long], "orphan text"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      CorpusPipeline.scrub(docs, col("doc_id"), "text").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null id")), e.toString)
    // reserved clean_text guard
    val bad = Seq((1L, "t", "x")).toDF("doc_id", "text", "clean_text")
    intercept[IllegalArgumentException] {
      CorpusPipeline.scrub(bad, col("doc_id"), "text")
    }
  }

  test("scrub -> run -> decontaminate: the full corpus recipe composes") {
    import graft.llm.Decontamination
    val boiler = "subscribe to our newsletter today"
    val evalRun = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      // Shared boilerplate line + distinct PII: the content lines differ
      // pre-scrub (an identical line would itself be removed as corpus-
      // wide boilerplate) but CONVERGE once the phone numbers redact to
      // the same sentinel — near-dup detection must see scrubbed text.
      (1L, s"$boiler\n$good call 030-1234-5678 now"),
      (2L, s"$boiler\n$good call 555 666 7777 tonight"),
      (3L, s"the evaluation set contains $evalRun which this document " +
        "repeats verbatim so it must be removed from training data here"),
      (4L, "completely different content about spark query engines and " +
        "columnar execution with vectorized operators for the modern data stack")
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val evalSet = Seq((100L, s"benchmark question: $evalRun ?"))
      .toDF("doc_id", "text")

    val scrubbed = CorpusPipeline.scrub(docs, col("doc_id"), "text")
    assert(scrubbed.columns.toSeq == docs.columns.toSeq)
    val t1 = scrubbed.filter(col("doc_id") === 1).select("text").as[String].head()
    assert(!t1.contains(boiler) && t1.contains("<PHONE>") && t1.contains(good))

    val deduped = CorpusPipeline.run(scrubbed, col("doc_id"), col("text"),
      minQuality = 3, threshold = 0.8)
    val clean = Decontamination.decontaminated(deduped, col("doc_id"), col("text"),
      evalSet, col("doc_id"), col("text"), n = 8)
    assert(clean.columns.toSeq == docs.columns.toSeq)
    // 2 collapsed into 1 (near dup once boilerplate is gone), 3 removed
    // by decontamination, 1 and 4 survive
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }
}
