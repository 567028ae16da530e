package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. '19): score every
  * document with a language model, split each language's corpus into
  * head / middle / tail terciles by perplexity, and keep the cleaner
  * head+middle for training. Here the LM is the corpus's own
  * [[BigramLm]] (no external model), so the whole stage trains,
  * scores, and buckets in one job.
  *
  * Scale shape — the part CCNet gets for free on a single box and a
  * 100 TB corpus does not: the tercile CUTOFFS come from the
  * [[graft.operators.IntStats.weightedQuantilesBisect]] multi-way
  * value-domain search (O(log rounds) map-combinable aggregate passes,
  * cutoff table bounded by languages × quantiles), NOT from a per-lang
  * `ntile` window — an ntile over a 100 TB language partition is a
  * global sort of the corpus; the bisection never sorts, and the
  * assignment is a broadcast join + map-side CASE. Ties at a cutoff
  * all land on the lower bucket (the bisection returns the smallest
  * value covering the target mass), so the split is deterministic and
  * hash-gateable with no tie-break column.
  */
object PerplexityBuckets {

  /** Per-doc bucket report: `(doc_id, lang, n_bigrams, xent_i, p33,
    * p66, bucket, keep)`. `xent_i` is the 4-dp bigram cross-entropy as
    * an exact integer (×10⁴); docs below 2 tokens carry bucket 'na'
    * and null cutoffs. `keep` marks head+middle — the CCNet policy. */
  def buckets(docs: DataFrame, id: Column, text: Column,
              lang: Column): DataFrame = {
    import graft.operators.IntStats
    // persist: the scored frame is read twice — the bisection's seeded
    // base projection and the final bucket assignment — and its lineage
    // is the full BigramLm corpus pass; without the cache that pass
    // runs twice. Per-doc rows, so the footprint is O(docs), not corpus
    // text. Released below via the BigramLm.score lifecycle (eager
    // checkpoint of the result, then unpersist) so library callers
    // outside Verify/Bench don't accumulate cache entries per call.
    val scored = BigramLm.score(docs, id, text)
      .join(docs.select(id.as("doc_id"), lang.as("lang")), "doc_id")
      // round(xent·10⁴) recovers the exact integer behind the 4-dp
      // round (the double sits within ~1e-10 of it — never at a .5)
      .withColumn("xent_i",
        when(col("n_bigrams") > 0, round(col("xent") * lit(10000)).cast("long")))
      .persist()
    val cuts = IntStats.weightedQuantilesBisect(
      scored.filter(col("n_bigrams") > 0), col("lang"), col("xent_i"),
      lit(1L), Seq((1L, 3L), (2L, 3L)),
      unitWeightApproxSeed = true) // w ≡ 1 here; seed cuts ~9 rounds to ~2
      .select(col("k").as("lang"),
        element_at(col("weighted_qs"), 1).as("p33"),
        element_at(col("weighted_qs"), 2).as("p66"))
    val out = scored.join(broadcast(cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("xent_i"),
        when(col("n_bigrams") > 0, col("p33")).as("p33"),
        when(col("n_bigrams") > 0, col("p66")).as("p66"),
        when(col("n_bigrams") === 0, "na")
          .when(col("xent_i") <= col("p33"), "head")
          .when(col("xent_i") <= col("p66"), "middle")
          .otherwise("tail").as("bucket"))
      .withColumn("keep", col("bucket").isin("head", "middle"))
      .localCheckpoint(true)
    scored.unpersist()
    out
  }
}
