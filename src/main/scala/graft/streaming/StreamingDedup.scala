package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Streaming deduplication — the streaming counterpart of
  * [[graft.llm.TextOps.exactDuplicateGroups]] for continuous document
  * ingest: drop every document whose normalized-text fingerprint was
  * already seen.
  *
  * Two state regimes, both keyed by the md5 fingerprint (state is one
  * tiny row per DISTINCT document — never the corpus text):
  *
  *  - [[exactDedup]]: `dropDuplicates` on the fingerprint with unbounded
  *    state — exact forever, state grows with distinct documents. Right
  *    when the distinct-fingerprint set fits the state store (it is 16
  *    bytes a row; 10^10 documents ≈ manageable RocksDB state, far
  *    smaller than the corpus itself).
  *  - [[windowedDedup]]: `dropDuplicatesWithinWatermark` — exact within
  *    the watermark horizon, state EVICTED once the watermark passes.
  *    Right for unbounded streams where duplicates arrive close together
  *    (the common crawl/firehose case: re-posts and mirror fetches
  *    cluster in time).
  *
  * Near-dup variants compose upstream of this: map documents through
  * `simhash60`/`shingle_hash_set` band keys first, then dedup on the
  * sketch key with the same two operators.
  */
object StreamingDedup {

  /** Documents with the dedup key attached (works on static frames too —
    * the batch/stream parity the specs assert). `ts` must be an
    * event-time timestamp column for the windowed variant. */
  def withFingerprint(docs: DataFrame): DataFrame =
    docs.withColumn("fingerprint", TextOps.fingerprint(col("text")))

  /** First occurrence of each fingerprint, unbounded state. */
  def exactDedup(docs: DataFrame): DataFrame =
    withFingerprint(docs).dropDuplicates("fingerprint")

  /** First occurrence within the watermark horizon; duplicate state is
    * dropped once event time moves past `horizon`. */
  def windowedDedup(docs: DataFrame, horizon: String): DataFrame =
    withFingerprint(docs)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fingerprint")
}
