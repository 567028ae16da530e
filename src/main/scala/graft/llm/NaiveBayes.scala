package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — train and score in one
  * job. This is the LEARNED counterpart of the heuristic filters
  * ([[TextOps]] langid/quality): the quality-classifier stage of the
  * GPT-3/LLaMA-style curation pipelines labels documents from curated
  * sources positive, a random crawl sample negative, fits a linear
  * model over token counts, and keeps high scorers. A multinomial NB
  * log-likelihood ratio IS such a linear model (per-token weight
  * lr(t) = ln P(t|pos) − ln P(t|neg), document score = Σ tf·lr +
  * prior), with the training reduced to two count aggregations — no
  * gradient loop, so the whole fit is exact integer counts and the
  * scoring is hash-gateable double math.
  *
  * Model: add-one smoothing over the TRAIN vocabulary V,
  * P(t|class) = (c_class(t) + 1) / (N_class + V); tokens unseen in
  * train still contribute the smoothed floor ratio (c = 0 on one or
  * both sides). Document prior ln((n_pos_docs+1)/(n_neg_docs+1)).
  *
  * Scale shape (the [[BigramLm]] discipline): ONE corpus explode
  * produces the per-doc token multiplicities; the class-conditional
  * token counts are a vocabulary-bounded reduction of that table over
  * the train split (map-combinable integer sums) broadcast back; the
  * totals and the prior are 1-row broadcasts; the only corpus-sized
  * shuffle is the per-doc reduce. Per-doc contributions fold in
  * token-sorted order (the q55/q91 trick) so the double sum is
  * bit-stable and the DuckDB oracle reproduces it exactly.
  */
object NaiveBayes {

  /** Per-document scores: `(doc_id, n_toks, score_ppm, predicted)`.
    * `label` must be a boolean column (positive class), `isTrain` the
    * boolean fit mask; every row is scored, only `isTrain` rows are
    * fitted. `score_ppm` = floor(1e6·(Σ tf·lr + prior)); `predicted` =
    * score_ppm > 0. Docs with no tokens carry the prior alone.
    *
    * `cache = true` (default): the per-doc tf table feeds the count
    * branch and the scoring branch — persist across the two consumers,
    * eagerly localCheckpoint the result, unpersist before returning
    * (the [[BigramLm.score]] lifecycle). */
  def trainScore(docs: DataFrame, id: Column, text: Column,
                 label: Column, isTrain: Column,
                 cache: Boolean = true): DataFrame = {
    val meta = docs.select(id.as("doc_id"), label.as("y"), isTrain.as("tr"))
    val tf0 = docs
      .select(id.as("doc_id"), explode(TextOps.lowerTokens(text)).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val tf = if (cache)
      tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tf0
    // class-conditional token counts over the train split: vocab-bounded
    val cnt = tf.join(meta, "doc_id").filter(col("tr"))
      .groupBy(col("tok"))
      .agg(sum(when(col("y"), col("tf")).otherwise(0L)).as("cg"),
        sum(when(!col("y"), col("tf")).otherwise(0L)).as("cb"))
    // totals + train vocabulary size: 1 row, broadcasts
    val tot = cnt.agg(sum(col("cg")).as("ng"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val pri = meta.filter(col("tr")).agg(
      log((count(when(col("y"), 1)) + lit(1L)).cast("double") /
        (count(when(!col("y"), 1)) + lit(1L)).cast("double")).as("prior"))
    val co = tf.join(broadcast(cnt), Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("c", col("tf").cast("double") *
        (log((coalesce(col("cg"), lit(0L)) + lit(1L)).cast("double") /
          (col("ng") + col("v")).cast("double")) -
          log((coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
            (col("nb") + col("v")).cast("double"))))
    val sm = co.groupBy(col("doc_id")).agg(
      sum(col("tf")).as("n_toks"),
      aggregate(sort_array(collect_list(struct(col("tok"), col("c")))),
        lit(0.0), (a, x) => a + x.getField("c")).as("s"))
    val result = meta.select(col("doc_id"))
      .join(sm, Seq("doc_id"), "left")
      .crossJoin(broadcast(pri))
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        floor(lit(1e6) * (coalesce(col("s"), lit(0.0)) + col("prior")))
          .cast("long").as("score_ppm"))
      .withColumn("predicted", col("score_ppm") > 0)
    if (cache) {
      val out = result.localCheckpoint(true)
      tf.unpersist()
      out
    } else result
  }
}
