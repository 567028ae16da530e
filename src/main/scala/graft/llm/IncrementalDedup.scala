package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental corpus admission — dedup a NEW BATCH of documents against
  * an EXISTING corpus without recomputing any corpus-internal work. This
  * is the production shape of dedup at 100 TB: the corpus is ingested
  * once and then grows by daily/hourly batches, and re-running the full
  * all-pairs pipeline per batch would cost O(corpus) every day. Here the
  * per-batch cost is O(batch) plus one probe of corpus-keyed tables:
  *
  *  1. EXACT, within batch: one survivor per normalized-text fingerprint
  *     (map-combinable `min_by`, same shape as
  *     [[graft.jobs.CorpusPipeline.run]]);
  *  2. EXACT, vs corpus: anti-join the batch's fingerprints against the
  *     corpus's — a batch document whose text already exists verbatim is
  *     dropped;
  *  3. NEAR, vs corpus: [[crossPairs]] — LSH band keys from both sides,
  *     candidates ONLY across the corpus/batch boundary (never
  *     corpus x corpus, which a fresh [[MinHashLsh.verifiedPairs]] over
  *     the union would redundantly re-verify), exact-Jaccard verified;
  *     any batch document near-duplicating a corpus document is dropped
  *     (the corpus copy is canonical — it may already be training);
  *  4. NEAR, within batch: verified pairs over the still-standing batch
  *     documents, connected components, one survivor per cluster
  *     ([[DedupClusters.survivors]]).
  *
  * Scale notes: the corpus-side artifacts this probes — the fingerprint
  * set of step 2 and the (doc_id, hs) table feeding step 3's band keys —
  * are pure functions of corpus text, so a production deployment writes
  * them ONCE at ingest (ideally bucketed by fingerprint / band key via
  * [[graft.sources.Bucketing]], making the per-batch probes shuffle-free
  * on the corpus side) and appends each admitted batch's rows. Batches
  * are small relative to the corpus, so AQE plans the batch side of the
  * band join as the broadcast/build side. Nothing in any step scans
  * corpus text again.
  *
  * Oracle-gated end-to-end (q78) against a DuckDB mirror that splits the
  * documents table deterministically, then replays all four stages with
  * brute-force exact Jaccard and a recursive-CTE closure.
  */
object IncrementalDedup {

  /** Verified near-duplicate pairs ACROSS two document sets, never
    * within one: (corpus_id, batch_id, jaccard). Both inputs follow the
    * (doc_id, hs) contract of [[MinHashLsh.hashSets]] (sorted-distinct
    * mod-P shingle hash set). The candidate join is by (band, key) —
    * uniform by construction, the batch side orders of magnitude
    * smaller, so the exchange is bounded by the batch unless the data
    * truly contains mass cross-duplication. Same persist/localCheckpoint
    * lifecycle as [[MinHashLsh.pairsFromSets]]: nothing stays cached
    * after the call. */
  def crossPairs(corpusSets0: DataFrame, batchSets0: DataFrame,
                 threshold: Double, cacheSets: Boolean = true): DataFrame = {
    val cs = if (cacheSets) corpusSets0.persist(StorageLevel.MEMORY_AND_DISK)
    else corpusSets0
    val bs = if (cacheSets) batchSets0.persist(StorageLevel.MEMORY_AND_DISK)
    else batchSets0
    val cb = MinHashLsh.bandedKeysNative(cs).toDF("corpus_id", "band", "key")
    val bb = MinHashLsh.bandedKeysNative(bs).toDF("batch_id", "band", "key")
    val cands = cb.join(bb, Seq("band", "key"))
      .select("corpus_id", "batch_id").distinct()
    val result = cands
      .join(cs.select(col("doc_id").as("corpus_id"), col("hs").as("ha")), "corpus_id")
      .join(bs.select(col("doc_id").as("batch_id"), col("hs").as("hb")), "batch_id")
      .withColumn("n_shared",
        call_function("sorted_intersect_size", col("ha"), col("hb")))
      .withColumn("jaccard", round(
        col("n_shared").cast("double") /
          (size(col("ha")) + size(col("hb")) - col("n_shared")), 4))
      .where(col("jaccard") >= threshold)
      .select("corpus_id", "batch_id", "jaccard")
    if (cacheSets) {
      val out = result.localCheckpoint(eager = true)
      cs.unpersist(); bs.unpersist()
      out
    } else result
  }

  /** The batch rows that enter the corpus, schema-preserved (append the
    * result to the corpus and its derived fingerprint/hash-set tables).
    * `id` must be unique within `batch` and across both frames. */
  def admit(corpus: DataFrame, batch: DataFrame, id: Column, text: Column,
            threshold: Double = 0.8): DataFrame = {
    // scratch names would silently swallow same-named input columns
    require(!batch.columns.contains("_fp") && !batch.columns.contains("_graft_id"),
      "batch must not contain the reserved columns _fp / _graft_id")
    val cols = batch.columns
    // 1. within-batch exact survivor (one map-combinable shuffle; null
    // fingerprints — null text — collapse to one survivor like any group)
    val bx = batch.withColumn("_fp", TextOps.fingerprint(text))
      .groupBy(col("_fp"))
      .agg(min_by(struct(cols.map(col): _*), id).as("_row"))
      .select(col("_fp") +: cols.map(c => col(s"_row.$c")): _*)
    // 2. corpus-exact anti-join (null _fp never matches — a null-text
    // batch survivor is not dropped by a null-text corpus doc; near-dup
    // stages cannot see either, so exact-null collapse is the contract)
    val corpusFps = corpus.select(TextOps.fingerprint(text).as("_fp")).distinct()
    val bNew = bx.join(corpusFps, Seq("_fp"), "left_anti").drop("_fp")
    // 3. cross-set near-dup drop
    val cross = crossPairs(
      MinHashLsh.hashSets(corpus, id, text),
      MinHashLsh.hashSets(bNew, id, text), threshold)
    val rem = bNew.withColumn("_graft_id", id)
      .join(cross.select(col("batch_id").as("_graft_id")).distinct(),
        Seq("_graft_id"), "left_anti")
      .drop("_graft_id")
    // 4. within-batch near-dup clusters over what still stands
    val pairs = MinHashLsh.verifiedPairs(rem, id, text, threshold)
    DedupClusters.survivors(rem, id, pairs)
  }
}
