package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style span corruption — the denoising-objective counterpart of
  * the causal-LM assembly (q130/q162): mask contiguous token spans
  * with numbered sentinels and emit the (input, target) pair the
  * encoder–decoder objective trains on (Raffel et al. '20 §3.1.4).
  *
  * Determinism discipline: the reference algorithm draws span starts
  * at random; here the token stream is cut into fixed windows of
  * `window` tokens and each FULL window corrupts one `spanLen`-token
  * span whose offset comes from the doc+window md5 (the [[Dsir]] /
  * [[graft.operators.Bootstrap]] no-RNG uniform). Corruption rate =
  * spanLen/window by construction (15% at 3/20, the T5 default),
  * spans can never overlap, the tail window stays clean, and the
  * whole (input, target) pair hash-gates against DuckDB.
  *
  * Scale shape: pure per-row HOF arithmetic over the ids array — no
  * shuffle, no UDF, whole-stage codegen; the only corpus-sized work
  * is the tokenization the plan already pays for. */
object SpanCorruption {

  /** Corrupt `idsCol` (an `array<int>` token-id column, e.g.
    * `bpe_encode_ids(text)`). Per document: token/span counts, the
    * sentinel-masked input stream, the sentinel-delimited target
    * stream (both comma-joined strings — the q119 serialization), and
    * the realized corruption rate in ppm. Sentinel k is
    * `sentinelBase + k`, outside any real vocab id. */
  def corrupt(df: DataFrame, idCol: Column, idsCol: Column,
              window: Int = 20, spanLen: Int = 3,
              sentinelBase: Int = 1000000): DataFrame = {
    require(window > spanLen && spanLen > 0,
      s"need window > spanLen > 0: $window/$spanLen")
    val m = window - spanLen + 1 // valid in-window offsets
    def off(k: Column): Column = pmod(Splits.md5Long(
      concat(col("doc_id").cast("string"), lit(":"), k.cast("string"))),
      lit(m.toLong)).cast("int")
    def start(k: Column): Column = k * window + off(k) // 0-based
    // clean segment before span k: from the previous span's end
    def segStart(k: Column): Column =
      when(k === 0, lit(0)).otherwise((k - 1) * window + off(k - 1) + spanLen)
    def sentinel(k: Column): Column = (lit(sentinelBase) + k).cast("int")
    val ks = sequence(lit(0), col("ns") - 1)
    val lastEnd = (col("ns") - 1) * window + off(col("ns") - 1) + spanLen
    val masked = when(col("ns") >= 1,
      concat(
        flatten(transform(ks, k =>
          concat(slice(col("ids"), segStart(k) + 1, start(k) - segStart(k)),
            array(sentinel(k))))),
        slice(col("ids"), lastEnd + 1, col("n") - lastEnd)))
      .otherwise(col("ids"))
    val target = when(col("ns") >= 1,
      flatten(transform(ks, k =>
        concat(array(sentinel(k)),
          slice(col("ids"), start(k) + 1, lit(spanLen))))))
      .otherwise(slice(col("ids"), 1, 0)) // typed empty array
    df.select(idCol.as("doc_id"), idsCol.as("ids"))
      .withColumn("n", coalesce(size(col("ids")), lit(0)))
      .withColumn("ns", floor(col("n").cast("double") / window).cast("int"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("ns").cast("long").as("n_spans"),
        coalesce(array_join(transform(masked, _.cast("string")), ","),
          lit("")).as("masked_str"),
        coalesce(array_join(transform(target, _.cast("string")), ","),
          lit("")).as("target_str"),
        floor(lit(1000000.0) * (col("ns").cast("long") * spanLen)
          .cast("double") / greatest(col("n"), lit(1)).cast("double"))
          .cast("long").as("corrupt_ppm"))
  }
}
