package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index construction — the search-side artifact a
  * corpus pipeline exports next to the training shards (BM25 retrieval,
  * phrase queries, decontamination tooling all read one).
  *
  * The index IS a flat `(term, doc_id, tf, positions)` table: in a
  * distributed setting a "posting list" is exactly the term-partitioned
  * row group, so materializing nested per-term arrays would only move
  * the same bytes into one task's row. Rows come out term-partitioned
  * (the natural bucketing/write layout) and positions are 1-based
  * ascending within each document.
  *
  * Scale shape: one posexplode (narrow), one (term, doc) aggregation —
  * map-combinable, state bounded by a single document's length — and a
  * term-level document-frequency aggregation over the already-reduced
  * per-doc table (vocab-sized, never the corpus). `maxDf` drops
  * stop-terms whose posting lists nobody scans sequentially anyway;
  * `minDf` drops hapax noise. Both bounds applied AFTER the per-doc
  * reduce, so no skewed term ever concentrates raw token rows.
  */
object InvertedIndex {

  /** `(term, doc_id, tf, positions: array<long> 1-based sorted)` for
    * terms with document frequency in [minDf, maxDf].
    *
    * `cache = true` (default): the per-doc posting frame feeds both
    * the df filter and the final join — persisted across the two
    * consumers, result eagerly checkpointed, cache released (the
    * BigramLm lifecycle); `cache = false` exposes the lazy plan. */
  def postings(docs: DataFrame, id: Column, text: Column,
               minDf: Int = 2, maxDf: Int = 1000000,
               cache: Boolean = true): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"bad df bounds: $minDf/$maxDf")
    val tok = docs
      .select(id.as("doc_id"),
        posexplode(TextOps.lowerTokens(text)).as(Seq("_pos", "term")))
    val perDoc0 = tok
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list((col("_pos") + 1).cast("long")))
          .as("positions"))
    val perDoc = if (cache)
      perDoc0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else perDoc0
    val dft = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    val result = perDoc.join(dft.select("term"), "term")
      .select("term", "doc_id", "tf", "positions")
    if (cache) {
      val out = result.localCheckpoint(true)
      perDoc.unpersist()
      out
    } else result
  }

  /** Write the SERVING index artifact for `docs` at `path`: one row per
    * (term, doc) with tf and the positional posting list delta+varint
    * packed (`positions_packed` binary — the [[graft.expressions.Varint]]
    * codec, ~5–8× smaller than raw int64 arrays). Unbounded df (minDf=1,
    * no maxDf): a SERVING index must answer any phrase, so no term may
    * be missing — the df bounds exist for analysis-sized postings, not
    * for search. Rows are repartitioned by term so each term's posting
    * rows co-locate in files (at scale: bucket by term), and parquet
    * min/max column stats on `term` let a phrase query's `term IN (...)`
    * predicate prune row groups — the consumer never scans the corpus
    * OR the full index. */
  def writeIndexArtifact(docs: DataFrame, id: Column, text: Column,
                         path: String): Unit = {
    postings(docs, id, text, minDf = 1, maxDf = Int.MaxValue)
      .select(col("term"), col("doc_id"), col("tf"),
        call_function("varint_pack", col("positions")).as("positions_packed"))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(path)
  }

  /** Exact phrase search answered FROM the index artifact (round-9
    * verdict task #5 — the posting-list consumer): per phrase slot, one
    * filtered read of the index (term-pruned scan), positions decoded
    * by the native varint codec in-projection, then the identical
    * per-doc HOF alignment as [[phraseSearch]]. The plan touches ONLY
    * the index table — no scan of the documents corpus (PlanSpec-
    * asserted), which is the entire point of exporting the artifact. */
  def phraseSearchFromIndex(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phrase needs at least 2 terms")
    require(phrase.map(_.toLowerCase) == phrase, "phrase must be lowercase")
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      index.where(col("term") === t)
        .select(col("doc_id"),
          call_function("varint_unpack", col("positions_packed")).as(s"p$i"))
    }
    val joined = slots.reduce((a, b) => a.join(b, "doc_id"))
    val matches = phrase.indices.tail
      .foldLeft(col("p0"))((acc, i) =>
        filter(acc, p => array_contains(col(s"p$i"), p + i)))
    joined
      .withColumn("n_matches", size(matches).cast("long"))
      .where(col("n_matches") > 0)
      .select(col("doc_id"), col("n_matches"))
  }

  /** Exact phrase search via positional postings: documents containing
    * `phrase` as CONSECUTIVE tokens, with the match count. Tokens are
    * filtered to the phrase terms BEFORE any aggregation (the BM25
    * trick — the first exchange carries only phrase-term rows, not the
    * corpus), then one postings frame per phrase slot joins on doc_id
    * and the alignment check runs as a HOF over the bounded position
    * arrays: a start position p matches iff slot i's postings contain
    * p + i for every i. No index scan, no window, no unbounded state. */
  def phraseSearch(docs: DataFrame, id: Column, text: Column,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phrase needs at least 2 terms")
    require(phrase.map(_.toLowerCase) == phrase, "phrase must be lowercase")
    val tok = docs
      .select(id.as("doc_id"),
        posexplode(TextOps.lowerTokens(text)).as(Seq("_pos", "term")))
      .where(col("term").isin(phrase.distinct.map(x => x: Any): _*))
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      tok.where(col("term") === t)
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list((col("_pos") + 1).cast("long")))
          .as(s"p$i"))
    }
    val joined = slots.reduce((a, b) => a.join(b, "doc_id"))
    val matches = phrase.indices.tail
      .foldLeft(col("p0"))((acc, i) =>
        filter(acc, p => array_contains(col(s"p$i"), p + i)))
    joined
      .withColumn("n_matches", size(matches).cast("long"))
      .where(col("n_matches") > 0)
      .select(col("doc_id"), col("n_matches"))
  }
}
