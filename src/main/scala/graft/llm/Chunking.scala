package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the context-length splitter every
  * training pipeline runs before packing: a document longer than the
  * model's window becomes overlapping chunks of `chunkTokens` tokens at
  * `stride` intervals, so no span is lost at a chunk boundary.
  *
  * Chunk starts are 0, stride, 2·stride, … while they cut NEW text: a
  * trailing start whose window [s, s+chunkTokens) is fully inside the
  * previous window (s − stride + chunkTokens ≥ n) is dropped, so the
  * chunk set covers the document exactly once per position beyond the
  * declared overlap — no fully-redundant tail chunk leaks a duplicate
  * into the corpus.
  *
  * Scale shape: pure per-row projection + generator — the starts array
  * is built with `sequence`/`filter`, exploded, and sliced, all inside
  * whole-stage codegen; no shuffle, no state. Fan-out is bounded at
  * ⌈n/stride⌉ rows per doc, proportional to the document's own size.
  * Chunk ids (`doc_id`, `chunk_id` = start/stride) are deterministic,
  * so re-runs and incremental admission see stable keys.
  */
object Chunking {

  /** One row per chunk: `(doc_id, chunk_id, n_chunk_tokens,
    * chunk_text)`. Documents with zero tokens produce no rows. */
  def chunk(docs: DataFrame, id: Column, text: Column,
            chunkTokens: Int = 40, stride: Int = 30): DataFrame =
    chunkTokenized(docs, id, TextOps.lowerTokens(text), chunkTokens, stride)

  /** Chunk by REAL tokenizer units: same windows/stride over the
    * checked-in-vocab BPE stream ([[Bpe]]), so chunk budgets line up
    * with what a model actually consumes. `chunk_text` renders the
    * token stream space-joined (BPE symbols contain no whitespace). */
  def chunkBpe(docs: DataFrame, id: Column, text: Column,
               chunkTokens: Int = 40, stride: Int = 30): DataFrame =
    chunkTokenized(docs, id, call_function("bpe_encode", text),
      chunkTokens, stride)

  /** Generic core over any pre-tokenized array<string> column. */
  def chunkTokenized(docs: DataFrame, id: Column, tokens: Column,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens: $chunkTokens/$stride")
    val toked = docs
      .select(id.as("doc_id"), tokens.as("_toks"))
      .withColumn("_n", coalesce(size(col("_toks")), lit(0)).cast("long"))
      .where(col("_n") > 0)
    val starts = filter(
      sequence(lit(0L), col("_n") - 1L, lit(stride.toLong)),
      s => (s === 0L) || (s - stride + chunkTokens < col("_n")))
    toked
      .select(col("doc_id"), col("_toks"), col("_n"),
        explode(starts).as("_s"))
      .select(col("doc_id"),
        (col("_s") / stride).cast("long").as("chunk_id"),
        least(lit(chunkTokens.toLong), col("_n") - col("_s"))
          .as("n_chunk_tokens"),
        array_join(slice(col("_toks"), (col("_s") + 1L).cast("int"),
          lit(chunkTokens)), " ").as("chunk_text"))
  }
}
