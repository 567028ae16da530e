package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing — the step that turns a deduplicated corpus into
  * fixed-token-budget training sequences (each sequence concatenates
  * whole documents up to `budget` tokens; leftover space is padding, so
  * tighter packing = fewer wasted FLOPs).
  *
  * Sharded greedy first-fit-in-order:
  *  - documents are sharded by [[Splits.md5Bucket]] of their id —
  *    deterministic, partition-count-independent, and the unit of
  *    parallelism (packing is inherently sequential WITHIN a run of
  *    documents, so at 100 TB you scale by sharding, not by threading
  *    one global order);
  *  - within a shard, documents are visited in id order and appended to
  *    the current sequence until the next one would overflow `budget`,
  *    which starts a new sequence (a single over-budget document gets a
  *    sequence of its own — the caller decides whether to truncate it).
  *
  * The chained reset ("new sequence iff fill + n > budget") is the same
  * shape as streaming dedup's horizon restart: not expressible with
  * fixed-frame window functions, so it runs as ONE hash exchange on the
  * shard, an in-partition secondary sort, and a single pass holding two
  * longs of state — no per-shard buffering, 10^9-document shards stream
  * through.
  *
  * Oracle-gated (q65) against a DuckDB recursive-CTE mirror of the same
  * chain.
  */
object Packing {

  /** Output: (shard, doc_id, n_tokens, seq_no, offset) — one row per
    * document; `seq_no` numbers sequences from 1 within each shard and
    * `offset` is the document's first token position inside its
    * sequence (what the downstream assembly writes attention masks
    * from). */
  /** The shared `(shard, doc_id, n_tokens)` projection both packing
    * formulations consume. */
  def packedBase(docs: DataFrame, id: org.apache.spark.sql.Column,
                 nTokens: org.apache.spark.sql.Column, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    docs.select(
      Splits.md5Bucket(id.cast("string"), shards).as("shard"),
      id.as("doc_id"),
      coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
  }

  /** Same chain via the custom Catalyst operator
    * ([[graft.plans.GreedyPackPlan]]): the distribution/ordering are
    * DECLARED to the planner instead of hand-rolled, so a child already
    * partitioned by shard pays no exchange (PlanSpec asserts; result
    * bit-equal to [[packGreedy]], q122 oracle-gates it). */
  def packGreedyPlan(docs: DataFrame, id: org.apache.spark.sql.Column,
                     nTokens: org.apache.spark.sql.Column,
                     budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    graft.plans.GreedyPack(packedBase(docs, id, nTokens, shards), budget)
  }

  def packGreedy(docs: DataFrame, id: org.apache.spark.sql.Column,
                 nTokens: org.apache.spark.sql.Column,
                 budget: Long, shards: Int): DataFrame =
    packChain(packedBase(docs, id, nTokens, shards), budget,
      Seq(col("shard"), col("doc_id")))

  /** LENGTH-SORTED packing (next-fit-DECREASING): the same chained pass
    * over a within-shard (n_tokens desc, doc_id) order. Kept as the
    * measured FOIL in q160: under the one-open-bin next-fit constraint,
    * decreasing order actually packs WORSE than arrival order on mixed
    * corpora (every bin's tail is wasted on the first medium doc that
    * overflows it) — the fill win of "sort by length" only materializes
    * with multiple open bins ([[packFirstFit]]). Same cost shape as
    * [[packGreedy]]: the sort key changes, the exchange does not. */
  def packGreedySorted(docs: DataFrame, id: org.apache.spark.sql.Column,
                       nTokens: org.apache.spark.sql.Column,
                       budget: Long, shards: Int): DataFrame =
    packChain(packedBase(docs, id, nTokens, shards), budget,
      Seq(col("shard"), col("n_tokens").desc, col("doc_id")))

  /** Open bins kept live per shard by [[packFirstFit]]: the bounded-K
    * variant of first-fit — classic FFD keeps EVERY bin open (O(bins)
    * state, unbounded on a 10⁹-doc shard); K bins is O(1) state with
    * nearly all of FFD's fill on real length distributions, because a
    * bin that the next K documents couldn't top up rarely gets topped
    * up later in a decreasing order. */
  val FfdOpenBins = 4

  /** FIRST-FIT-DECREASING packing with K bounded open bins — the
    * fill-rate upgrade over [[packGreedy]]'s next-fit chain: documents
    * are visited longest-first and each is placed in the OLDEST open
    * bin it fits (bins scanned in opening order); if none fits, the
    * oldest bin closes forever and a new one opens. `seq_no` numbers
    * bins in OPENING order within each shard; `offset` is the
    * document's first token position inside its bin.
    *
    * Same scale shape as every packing chain here: ONE shard exchange,
    * an in-partition secondary sort, and a single pass whose state is
    * K (fill, bin-id) pairs — constant, not corpus- or bin-count-sized.
    * The trade vs [[packGreedy]]: pack order inside a bin follows
    * placement (length-descending), not doc_id — id-ordered assembly
    * readers keep the arrival chain. Oracle-gated (q160) against a
    * DuckDB recursive-CTE mirror carrying the identical K-bin state. */
  def packFirstFit(docs: DataFrame, id: org.apache.spark.sql.Column,
                   nTokens: org.apache.spark.sql.Column,
                   budget: Long, shards: Int,
                   openBins: Int = FfdOpenBins): DataFrame =
    ffdPass(packedBase(docs, id, nTokens, shards), budget, openBins)

  /** The shared K-open-bin first-fit state pass: `base` must carry
    * `shard` at position 0 and `n_tokens` at position 2 (any further
    * columns ride along untouched); appends (seq_no, offset). One
    * shard exchange + secondary sort + a single pass holding K
    * (bin id, fill) pairs. */
  private def ffdPass(base: DataFrame, budget: Long,
                      openBins: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(openBins >= 1, s"openBins must be positive: $openBins")
    val sorted = base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("seq_no", LongType, nullable = false),
      StructField("offset", LongType, nullable = false)))
    sorted.mapPartitions { rows =>
      var curShard = 0L
      var started = false
      // open bins in OPENING order: parallel arrays of (bin id, fill)
      val ids = new scala.collection.mutable.ArrayBuffer[Long](openBins)
      val fills = new scala.collection.mutable.ArrayBuffer[Long](openBins)
      var nextId = 1L
      rows.map { r =>
        val shard = r.getLong(0)
        val nt = r.getLong(2)
        if (!started || shard != curShard) {
          started = true; curShard = shard
          ids.clear(); fills.clear(); nextId = 1L
        }
        var i = 0
        var placed = -1
        while (placed < 0 && i < ids.length) {
          if (fills(i) + nt <= budget) placed = i
          i += 1
        }
        val (bin, off) =
          if (placed >= 0) {
            val o = fills(placed); fills(placed) += nt; (ids(placed), o)
          } else {
            if (ids.length == openBins) { ids.remove(0); fills.remove(0) }
            ids += nextId; fills += nt; nextId += 1
            (nextId - 1, 0L)
          }
        Row.fromSeq(r.toSeq :+ bin :+ off)
      }
    }(Encoders.row(outSchema))
  }

  private def packChain(base: DataFrame, budget: Long,
                        order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val sorted = base.repartition(col("shard"))
      .sortWithinPartitions(order: _*)
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("seq_no", LongType, nullable = false),
      StructField("offset", LongType, nullable = false)))
    sorted.mapPartitions { rows =>
      var curShard = 0L
      var started = false
      var fill = 0L
      var seq = 0L
      rows.map { r =>
        val shard = r.getLong(0)
        val nt = r.getLong(2)
        if (!started || shard != curShard) {
          started = true; curShard = shard; seq = 1L; fill = nt
        } else if (fill + nt > budget) {
          seq += 1; fill = nt
        } else fill += nt
        Row(r.get(0), r.get(1), r.get(2), seq, fill - nt)
      }
    }(Encoders.row(outSchema))
  }

  /** Materialize the packed sequences themselves — the tensor-input
    * artifact a training loader reads: one row per (shard, seq_no) with
    * the concatenated token-id stream of its member documents in pack
    * order, plus the member count. `ids` is the per-document id-stream
    * column (e.g. `bpe_encode_ids(text)`); the pack budget is the
    * stream's own length (`size(ids)` — one id per token), so the
    * assignment and the assembled payload can never disagree.
    *
    * Scale shape: ONE pass. The id stream is computed once per document
    * (the `size(ids)` budget and the bare `ids` payload sit in the same
    * projection: [[graft.plans.BpeCountRewrite]]'s bare-consumed guard
    * keeps the `size` un-rewritten and codegen subexpression
    * elimination evaluates the merge loop once — PlanSpec counts the
    * generated `computeIds` call sites) and rides the single shard
    * exchange through the greedy state pass; no second encode branch,
    * no doc_id join back. The grouped collect is bounded by the BUDGET
    * (a sequence holds at most `budget` tokens — output-sized state,
    * not corpus-sized). `sort_array` over the (doc_id, ids) structs
    * keeps assembly order deterministic under any aggregation order. */
  def assembleSequences(docs: DataFrame, id: org.apache.spark.sql.Column,
                        ids: org.apache.spark.sql.Column,
                        budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shards > 0, s"shards must be positive: $shards")
    val base = docs.select(
      Splits.md5Bucket(id.cast("string"), shards).as("shard"),
      id.as("doc_id"),
      // a NULL stream (null-text doc) packs as 0 tokens, like
      // packedBase's coalesce
      coalesce(size(ids).cast("long"), lit(0L)).as("n_tokens"),
      ids.as("_ids"))
    val sorted = base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("seq_no", LongType, nullable = false)))
    val packed = sorted.mapPartitions { rows =>
      var curShard = 0L
      var started = false
      var fill = 0L
      var seq = 0L
      rows.map { r =>
        val shard = r.getLong(0)
        val nt = r.getLong(2)
        if (!started || shard != curShard) {
          started = true; curShard = shard; seq = 1L; fill = nt
        } else if (fill + nt > budget) {
          seq += 1; fill = nt
        } else fill += nt
        Row(r.get(0), r.get(1), r.get(2), r.get(3), seq)
      }
    }(Encoders.row(outSchema))
    packed
      .groupBy(col("shard"), col("seq_no"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("_ids"))))
        .as("_parts"))
      .select(col("shard"), col("seq_no"),
        size(col("_parts")).cast("long").as("n_docs"),
        // NULL id streams are dropped BEFORE flatten: flatten returns
        // NULL if ANY inner array is null, which would void the whole
        // sequence's stream
        flatten(transform(
          filter(col("_parts"), _.getField("_ids").isNotNull),
          _.getField("_ids"))).as("tokens"))
  }

  /** [[assembleSequences]] over the FIRST-FIT-DECREASING placement
    * ([[packFirstFit]]) instead of the arrival-order next-fit chain —
    * harvesting q160's measured fill win (up to +12% on the fixture =
    * that many fewer padding FLOPs per epoch) in the artifact a
    * training loader actually reads. In-bin order is PLACEMENT order
    * (length-descending visit), so members are assembled by their
    * `offset` (each document's first token position — strictly
    * increasing in placement order within a bin), not by doc_id; the
    * sort_array over (offset, doc_id, ids) structs keeps that
    * deterministic under any aggregation order. Cost shape is
    * identical to [[assembleSequences]]: the id stream is computed
    * once and rides the single shard exchange through the K-bin state
    * pass; the grouped collect stays budget-bounded. */
  def assembleSequencesFirstFit(docs: DataFrame,
                                id: org.apache.spark.sql.Column,
                                ids: org.apache.spark.sql.Column,
                                budget: Long, shards: Int,
                                openBins: Int = FfdOpenBins): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val base = docs.select(
      Splits.md5Bucket(id.cast("string"), shards).as("shard"),
      id.as("doc_id"),
      coalesce(size(ids).cast("long"), lit(0L)).as("n_tokens"),
      ids.as("_ids"))
    ffdPass(base, budget, openBins)
      .groupBy(col("shard"), col("seq_no"))
      .agg(sort_array(collect_list(
        struct(col("offset"), col("doc_id"), col("_ids")))).as("_parts"))
      .select(col("shard"), col("seq_no"),
        size(col("_parts")).cast("long").as("n_docs"),
        flatten(transform(
          filter(col("_parts"), _.getField("_ids").isNotNull),
          _.getField("_ids"))).as("tokens"))
  }
}
