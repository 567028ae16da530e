package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination — the n-gram overlap check every
  * training-corpus pipeline runs before shipping data: a candidate
  * training document that shares ≥ `minShared` distinct word n-grams
  * with any document of a held-out/benchmark corpus is flagged as
  * contaminated (the GPT-3 appendix-C recipe: 13-gram collision ⇒
  * overlap; smaller n for shorter documents).
  *
  * Scale shape (the property that must survive 100 TB of train text):
  *  - each side reduces to DISTINCT 60-bit n-gram hashes per doc
  *    (map-side, one pass, no shuffle);
  *  - the only exchange is the equi-join on the gram hash. The eval
  *    side is a benchmark corpus — thousands of docs, not billions —
  *    so AQE broadcasts it and the train side never shuffles at all;
  *  - natural-language n-grams at n ≥ 8 are near-unique (a hot gram is
  *    precisely the contamination signal), so there is no skewed key by
  *    construction; for adversarial inputs cap per-gram df like the
  *    PPJoin prefix filter ([[MinHashLsh.jaccardJoinFromSets]]).
  *
  * The 60-bit md5-prefix hash mirrors [[Splits.md5Bucket]] /
  * `shingle_hash_set`, so the DuckDB oracle reproduces the exact pair
  * set (collision probability at 60 bits is negligible and identical on
  * both sides).
  */
object Decontamination {

  /** (doc_id, grams): distinct 60-bit hashes of the doc's word n-grams,
    * one native pass per document ([[graft.expressions.WordNgramHashSetExpr]])
    * when GraftExtensions is active, else the set-identical HOF
    * formulation — public callers work in any session (round-5 review).
    * Tokens split on whitespace, empties dropped; texts shorter than n
    * tokens yield an empty set. */
  def ngramHashSet(docs: DataFrame, id: Column, text: Column,
                   n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    if (docs.sparkSession.catalog.functionExists("word_ngram_hash_set"))
      docs.select(id.as("doc_id"),
        call_function("word_ngram_hash_set", text, lit(n)).as("grams"))
    else ngramHashSetHof(docs, id, text, n)
  }

  /** HOF cross-check formulation of [[ngramHashSet]] (and the
    * no-extensions fallback): same tokenizer, same md5-prefix hash,
    * asserted set-equal in LlmTextSpec. `_ws` is materialized as a
    * column first so the lambda reads an attribute, not a re-evaluated
    * expression. */
  def ngramHashSetHof(docs: DataFrame, id: Column, text: Column,
                      n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ws = col("_ws")
    docs
      .select(id.as("doc_id"),
        filter(split(text, "\\s+"), w => w =!= "").as("_ws"))
      .select(col("doc_id"),
        when(ws.isNull, lit(null).cast("array<long>")) // null text → null, like the native expr
          .when(size(ws) >= n,
            array_distinct(transform(
              sequence(lit(1), size(ws) - (n - 1)),
              i => Splits.md5Long(concat_ws(" ", slice(ws, i, lit(n)))))))
          .otherwise(array().cast("array<long>")).as("grams"))
  }

  /** One row per contaminated (train doc, eval doc) pair with the count
    * of distinct shared n-grams. Output: (doc_id, eval_id, n_shared). */
  def contaminationPairs(train: DataFrame, trainId: Column, trainText: Column,
                         evalSet: DataFrame, evalId: Column, evalText: Column,
                         n: Int = 8, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val t = ngramHashSet(train, trainId, trainText, n)
      .select(col("doc_id"), explode(col("grams")).as("h"))
    val e = ngramHashSet(evalSet, evalId, evalText, n)
      .select(col("doc_id").as("eval_id"), explode(col("grams")).as("h"))
    // gram sets are distinct per doc, so count(*) == distinct shared grams
    t.join(e, "h")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** SEMANTIC decontamination report — the paraphrase-robust
    * complement of [[contaminationPairs]]: a training document whose
    * EMBEDDING sits within cosine `tau` of any eval/benchmark vector
    * is flagged even when it shares zero word n-grams with it (the
    * reworded-benchmark leak the GPT-3 recipe cannot see; the
    * retrieval-based decontamination practice, run with the q79
    * SemDeDup machinery ACROSS the train/eval boundary).
    *
    * Cross-set ONLY — train never self-joins: both sides hash into the
    * shared LSH tables ([[Similarity.bucketed]], one native pass), and
    * because the eval side is a benchmark corpus (thousands of rows,
    * not billions) BOTH its bucket keys and its vectors broadcast — the
    * train side is one map-side signature pass + a broadcast bucket
    * join + a broadcast vector join; no train-sized shuffle anywhere
    * (the [[contaminationPairs]] scale argument, embedding-shaped).
    *
    * Per train doc with ≥1 bucket collision: `n_cand` candidates,
    * `n_hits` at `tau`, `max_cosine`, and the `contaminated` flag. */
  def semanticReport(train: DataFrame, evalSet: DataFrame,
                     tau: Double): DataFrame = {
    val tb = Similarity.bucketed(train)
    val eb = Similarity.bucketed(evalSet)
    val cand = tb.select(col("vec_id").as("train_id"), col("t"), col("sig"))
      .join(broadcast(eb.select(col("vec_id").as("eval_id"), col("t"),
        col("sig"))), Seq("t", "sig"))
      .select("train_id", "eval_id").distinct()
    val scored = cand
      .join(train.select(col("vec_id").as("train_id"),
        col("embedding").as("ea")), "train_id")
      .join(broadcast(evalSet.select(col("vec_id").as("eval_id"),
        col("embedding").as("eb"))), "eval_id")
      .withColumn("cosine", round(Similarity.cosineD(col("ea"), col("eb")), 6))
    scored.groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("cosine") >= tau, 1L).otherwise(0L)).as("n_hits"),
        max(col("cosine")).as("max_cosine"))
      .withColumn("contaminated", col("n_hits") >= 1L)
  }

  /** The train corpus with contaminated documents removed (anti-join
    * against the flagged set — the small side by construction). */
  def decontaminated(train: DataFrame, trainId: Column, trainText: Column,
                     evalSet: DataFrame, evalId: Column, evalText: Column,
                     n: Int = 8, minShared: Int = 1): DataFrame = {
    require(!train.columns.contains("_graft_id"),
      "input must not contain the reserved column _graft_id")
    val bad = contaminationPairs(train, trainId, trainText,
      evalSet, evalId, evalText, n, minShared)
      .select(col("doc_id").as("_graft_id")).distinct()
    train.withColumn("_graft_id", trainId)
      .join(bad, Seq("_graft_id"), "left_anti")
      .drop("_graft_id")
  }
}
