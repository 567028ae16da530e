package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Splits

/** Streaming sequence packing — the continuous-ingest face of
  * [[graft.llm.Packing.packGreedy]]: documents arrive on a stream, and
  * each is assigned its training sequence (`seq_no`, `offset`) the
  * moment it lands, using the same sharded greedy first-fit chain the
  * batch operator runs.
  *
  * The per-shard packing cursor (current sequence number + fill) is
  * exactly two longs of [[GroupState]] per shard — state the size of
  * the SHARD COUNT, not the corpus, so a 100k-shard deployment carries
  * 100k tiny rows in the state store forever (no watermark needed;
  * `seq_no` never resets).
  *
  * Ordering contract (pinned by StreamingSpec): within a micro-batch a
  * shard's documents are packed in `doc_id` order; across batches, in
  * batch-arrival order. Replaying the SAME batch sequence through
  * [[graft.llm.Packing.packGreedy]]'s chain semantics — i.e. running
  * the batch operator per micro-batch while carrying (seq, fill)
  * forward — produces identical assignments; a single-batch stream is
  * bit-identical to the batch operator. (A stream has no global id
  * order to sort by — arrival order IS the stream's order; the shard
  * hash keeps any one sequence's documents on one cursor.)
  */
object StreamingPacker {

  case class PackedDoc(shard: Long, doc_id: Long, n_tokens: Long,
                       seq_no: Long, offset: Long)
  case class PackCursor(seq: Long, fill: Long)

  /** Attach (seq_no, offset) to a stream of (doc_id, n_tokens) rows.
    * Works on static frames too (the batch/stream parity the spec
    * asserts — Spark plans the same flatMapGroupsWithState). */
  def pack(docs: DataFrame, budget: Long, shards: Int): Dataset[PackedDoc] = {
    require(budget > 0 && shards > 0,
      s"invalid packer params: budget=$budget shards=$shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        Splits.md5Bucket(col("doc_id").cast("string"), shards)
          .cast("long").as("shard"),
        col("doc_id").cast("long").as("doc_id"),
        coalesce(col("n_tokens").cast("long"), lit(0L)).as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[PackCursor]) =>
          // micro-batch group iterators carry no order guarantee; the
          // contract sorts the batch's slice by doc_id (bounded by the
          // batch, not the corpus)
          val batch = rows.toArray.sortBy(_._2)
          var cur = state.getOption.getOrElse(PackCursor(0L, 0L))
          val out = batch.iterator.map { case (_, docId, nt) =>
            cur =
              if (cur.seq == 0L) PackCursor(1L, nt)
              else if (cur.fill + nt > budget) PackCursor(cur.seq + 1, nt)
              else PackCursor(cur.seq, cur.fill + nt)
            PackedDoc(shard, docId, nt, cur.seq, cur.fill - nt)
          }.toArray // materialize BEFORE state.update so the closure
          state.update(cur) //   sees every row's cursor advance
          out.iterator
      }
  }
}
