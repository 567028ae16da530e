package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** TF-IDF keyword extraction — the classic "what is this document
  * about" signal a training-data pipeline uses for topic balancing and
  * near-duplicate triage (two docs sharing their top terms are cluster
  * candidates before any expensive pairing runs).
  *
  * Shape at scale: one `(doc_id, term)` map-combinable count (partial
  * aggregation collapses each task's token stream before the shuffle),
  * one terms-sized `df` aggregation DERIVED from the tf frame (tf rows
  * are distinct per (doc, term), so `df` is a count, not a
  * count-distinct — no second pass over the corpus), a 1-row corpus
  * count that broadcasts, and a bounded-heap top-k per document
  * ([[graft.operators.TopK]] — O(k) state, no per-doc sort, hot docs
  * cost each task only k). Nothing here materializes on the driver.
  *
  * The idf is the smoothed form ln((N+1)/(df+1)) + 1: defined for
  * df = N (every-doc terms score tf, not 0) and mirrorable exactly —
  * the DuckDB oracle computes the identical expression tree, and the
  * score is rounded to 6 places on BOTH sides so the hash compare sees
  * the same doubles.
  */
object TfIdf {

  /** Top-`k` terms per document by tf-idf: `(doc_id, term, tf, score,
    * rank)`. Ties (identical tf and df ⇒ bit-identical score) break on
    * the term's UTF8 binary order, descending — deterministic, so the
    * kept set is stable across partitionings.
    *
    * `cache = true` (default, the BigramLm/MinHashLsh lifecycle): the
    * tf frame feeds BOTH the df aggregation and the scoring join —
    * without a persist each branch re-explodes the corpus. The result
    * is eagerly localCheckpointed and the cache released before
    * returning; `cache = false` exposes the lazy plan (specs). */
  /** `docPred` (on `doc_id`) restricts WHICH documents get keywords
    * while tf/df/N stay corpus-wide — the scale shape for "keywords of
    * these few docs" consumers ([[Retrieval.hybrid]]'s query side):
    * the filter lands before the top-k heap, so the bounded-state
    * stage only sees the selected docs' rows. */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int = 3,
               cache: Boolean = true, docPred: Column = lit(true)): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf0 = docs
      .select(id.as("doc_id"), explode(TextOps.lowerTokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tf = if (cache)
      tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tf0
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs")) // 1 row, broadcasts
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", round(
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) + 1.0), 6))
    val result = TopK.topKPerKey(scored.where(docPred), Seq(col("doc_id")),
        struct(col("score"), col("term"), col("tf")), k)
      .select(col("doc_id"), col("_row.term").as("term"),
        col("_row.tf").as("tf"), col("_row.score").as("score"), col("rank"))
    if (cache) {
      val out = result.localCheckpoint(true)
      tf.unpersist()
      out
    } else result
  }
}
