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

  /** Streaming NEAR-dup suppression on the SimHash sketch: documents
    * whose 60-bit simhash collides exactly are near-identical with high
    * probability (the batch q23/q32 fingerprint), so keying the same
    * dropDuplicates machinery by the sketch drops boilerplate re-posts
    * whose whitespace/punctuation edits defeat the exact fingerprint.
    * Zero-hamming collisions only — a streaming state store can equi-
    * match, not neighbor-search; candidates at hamming 1..k need the
    * batch pigeonhole pass ([[graft.llm.SimHash]]) over the admitted
    * stream. Same one-tiny-row-per-distinct-sketch state economics as
    * [[exactDedup]]. */
  def nearDupDedup(docs: DataFrame): DataFrame =
    docs.withColumn("simhash",
        org.apache.spark.sql.functions.call_function("simhash60", col("text")))
      .where(col("simhash").isNotNull) // null text: no tokens, no sketch
      .dropDuplicates("simhash")

  /** First occurrence within the watermark horizon; duplicate state is
    * dropped once event time moves past `horizon`. Its dedup CONTRACT
    * (not its incidental extra drops — see [[keepFirstWithinHorizon]])
    * is oracle-gated in batch form by q58. */
  def windowedDedup(docs: DataFrame, horizon: String): DataFrame =
    withFingerprint(docs)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Batch reference of [[windowedDedup]]'s keep-first-within-horizon
    * CONTRACT: per key in event-time order, a record is dropped iff it
    * falls within `horizonMs` of the last KEPT record, and a record past
    * that horizon is kept and restarts the chain (the streaming op's
    * state-eviction semantics; the streaming implementation is allowed
    * to additionally drop duplicates BEYOND the horizon while state
    * lingers pre-eviction, so batch-kept ⊇ stream-kept, equal when
    * duplicates cluster inside the horizon — the case the operator
    * exists for).
    *
    * Chained restart ("kept iff ts > last_kept + horizon") is not
    * expressible with fixed-frame window functions, so this is the
    * honest distributed shape: ONE hash exchange on the key, in-
    * partition secondary sort, then a single streaming pass holding one
    * timestamp of state per key — no per-group buffering, hot keys cost
    * O(1) memory. */
  def keepFirstWithinHorizon(events: DataFrame, keyCol: String, tsCol: String,
                             horizonMs: Long, tieBreaker: String): DataFrame = {
    val sorted = events.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(tieBreaker))
    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val tsIdx = schema.fieldIndex(tsCol)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var lastKept = Long.MinValue
      rows.filter { r =>
        val k = r.get(keyIdx)
        val t = r.getLong(tsIdx)
        if (!started || k != curKey) {
          started = true; curKey = k; lastKept = t; true
        } else if (t > lastKept + horizonMs) {
          lastKept = t; true
        } else false
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
