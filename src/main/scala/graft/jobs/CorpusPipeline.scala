package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.{DedupClusters, LineDedup, MinHashLsh, TextOps}

/** End-to-end training-corpus preparation — the composed pipeline the
  * individual LLM-data operators exist for:
  *
  *   1. QUALITY FILTER: drop documents scoring below `minQuality` on
  *      [[TextOps.qualityScore]] (length / punctuation / stopword
  *      density / token shape) — one native text_stats pass, no shuffle;
  *   2. EXACT DEDUP: keep the lowest-id document per normalized-text
  *      fingerprint (deterministic survivor choice) — one shuffle by
  *      fingerprint;
  *   3. NEAR DEDUP: minhash-LSH verified pairs over the survivors →
  *      connected components → keep each cluster's minimum-id member
  *      ([[DedupClusters.survivors]]).
  *
  * Stage order matters at scale: the cheap map-side quality filter runs
  * FIRST so the shuffling stages see only surviving rows, and exact
  * dedup runs before the (more expensive) near-dup candidate join.
  * Output preserves the input schema — downstream training jobs consume
  * it unchanged.
  */
object CorpusPipeline {

  def run(docs: DataFrame, id: Column, text: Column,
          minQuality: Int = 3, threshold: Double = 0.8): DataFrame = {
    // the scratch columns below would silently swallow same-named input
    // columns, violating the schema-preserving contract
    require(!docs.columns.contains("_fp") && !docs.columns.contains("_row"),
      "input must not contain the reserved columns _fp / _row")
    val filtered = docs.where(TextOps.qualityScore(text) >= minQuality)
    // Survivor per fingerprint via a single map-combinable min_by over
    // the whole row, NOT row_number over a fingerprint window: a
    // mass-duplicated document (10^8 copies of an empty or boilerplate
    // page) is one window partition = ONE task, the same straggler
    // shape as the PPJoin df window (round-4 verdict). min_by's partial
    // aggregation collapses the hot fingerprint map-side, in one
    // shuffle with no join-back.
    val cols = filtered.columns
    val exact = filtered.withColumn("_fp", TextOps.fingerprint(text))
      .groupBy(col("_fp"))
      .agg(min_by(struct(cols.map(col): _*), id).as("_row"))
      .select(cols.map(c => col(s"_row.$c")): _*)
    val pairs = MinHashLsh.verifiedPairs(exact, id, text, threshold)
    DedupClusters.survivors(exact, id, pairs)
  }

  /** Text-MUTATING scrub pre-pass: corpus-wide duplicated-line removal
    * ([[LineDedup]]) then PII redaction ([[TextOps.redactPii]]), with
    * `textCol` replaced in place — every other column and the column
    * order survive. Run BEFORE [[run]] so the dedup fingerprints and
    * shingles see the scrubbed text (boilerplate lines otherwise make
    * unrelated documents near-duplicates); follow [[run]] with
    * [[graft.llm.Decontamination.decontaminated]] against the eval
    * corpus for the full training-data recipe. `id` must be unique.
    * Stage semantics are oracle-gated individually (q52/q53); the
    * composition is spec-gated (CorpusPipelineSpec).
    *
    * Composition note: line dedup sees the ORIGINAL text, so lines whose
    * only difference is the PII that redaction later canonicalizes
    * ("call 104-555-0001" vs "call 105-555-9944" → both "call [PHONE]")
    * survive one scrub; a second scrub would then drop them as
    * cross-document duplicates. One pass is the contract; re-running
    * scrub only ever REMOVES whole lines (PropertySpec pins both). */
  def scrub(docs: DataFrame, id: Column, textCol: String,
            minDocs: Int = 2): DataFrame = {
    require(docs.columns.contains(textCol),
      s"no column named $textCol in ${docs.columns.mkString(", ")}")
    // _graft_id is the join key and clean_text the joined-in payload; an
    // input column of either name would make the join/col ambiguous
    require(!docs.columns.contains("_graft_id") &&
        !docs.columns.contains("clean_text"),
      "input must not contain the reserved columns _graft_id / clean_text")
    val cleaned = LineDedup.removeDuplicatedLines(docs, id, col(textCol), minDocs)
      .withColumnRenamed("doc_id", "_graft_id")
    // a null id never matches an equi-join key, so the inner join below
    // would silently DROP that document — fail loudly instead. The check
    // rides the existing map pass (raise_error), no extra job.
    val keyed = docs.withColumn("_graft_id",
      when(id.isNull, raise_error(lit(
        "scrub: null id — the _graft_id equi-join would silently drop this row")))
        .otherwise(id))
    keyed.join(cleaned, "_graft_id")
      .withColumn(textCol, TextOps.redactPii(col("clean_text")))
      .drop("_graft_id", "clean_text")
  }
}
