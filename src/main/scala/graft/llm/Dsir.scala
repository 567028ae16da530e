package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance RESAMPLING of a raw corpus
  * toward a target distribution over hashed n-gram features (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling" — the public method, re-derived here; the quality
  * knob between q80's declared per-stratum mixture and a trained
  * classifier: the target SET defines the distribution, no labels).
  *
  * Model: features = unigrams + bigrams of the lowercased whitespace
  * tokens, md5-hashed into `m` buckets (the paper's hashed n-gram
  * reduction — fixed dimensionality regardless of vocabulary). Both
  * distributions get add-α smoothing:
  *
  *   p̂[b]  = (c[b] + α) / (N + α·m)
  *   log w(d) = Σ_b tf_d[b] · ( ln p̂_target[b] − ln p̂_raw[b] )
  *
  * and selection draws k docs WITHOUT replacement with P ∝ w(d) via
  * Gumbel-top-k — the log-domain face of the A-ES reservoir
  * ([[Splits.weightedSample]]): key = log w + Gumbel(md5(id)), top-k
  * by key. No RNG anywhere, so the sample is stable across runs /
  * partitionings / AQE and the DuckDB oracle replays it exactly.
  *
  * Scale shape (the [[BigramLm]] discipline): ONE corpus explode
  * produces the per-doc bucket counts; BOTH bucket tables (raw and
  * target — target membership rides the explode as a flag) are
  * m-bounded reductions OF that table, never a second corpus pass;
  * the log-ratio table is m rows and broadcasts onto the per-doc
  * counts; the only corpus-sized shuffle is the per-doc reduce.
  * Selection is a bounded-heap global top-k ([[graft.operators.TopK]]
  * — O(k) state, map-side combine), not a sort. Doubles are
  * bit-stable: per-doc contributions fold in bucket-sorted order (the
  * q55/q75/q91 trick), so log weights — and therefore the Gumbel keys
  * and the selected set — hash-match the oracle.
  */
object Dsir {

  /** Hashed feature space size (buckets). 2^12 keeps the ratio table
    * broadcast-trivial while leaving hash collisions rare at fixture
    * vocabulary; production would raise it (the paper uses 10^4) —
    * every stage is m-bounded, so m only scales the broadcast. */
  val Buckets = 4096
  val Alpha = 0.5

  /** A document's hashed n-gram feature buckets (with multiplicity):
    * unigrams + bigrams, each md5-hashed into [0, m). */
  def featureBuckets(text: Column, m: Int = Buckets): Column =
    transform(concat(TextOps.lowerTokens(text), BigramLm.bigrams(text)),
      f => Splits.md5Long(f) % m)

  /** `(doc_id, is_target, n_feats, log_weight)` for every document:
    * the smoothed hashed-n-gram importance log weight
    * ln(p̂_target(d)/p̂_raw(d)). `isTarget` marks the rows whose
    * feature distribution defines the target (they score themselves —
    * DSIR selects from the RAW pool, so filter afterwards if the
    * target must be excluded). Docs with no features carry weight
    * ln 1 = 0. */
  def score(docs: DataFrame, id: Column, text: Column, isTarget: Column,
            m: Int = Buckets, alpha: Double = Alpha,
            cache: Boolean = true): DataFrame = {
    val base = docs.select(id.as("doc_id"), isTarget.as("_t"),
      text.as("_text"))
    val inst = base.select(col("doc_id"), col("_t"),
      explode(featureBuckets(col("_text"), m)).as("b"))
    // per-doc bucket multiplicities (the one corpus-sized shuffle,
    // map-combinable); feeds the ratio tables AND the per-doc fold
    val tf0 = inst.groupBy(col("doc_id"), col("_t"), col("b"))
      .agg(count(lit(1)).as("tf"))
    val tf = if (cache)
      tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tf0
    // raw + target bucket counts in one m-bounded reduction of tf
    val btab = tf.groupBy(col("b"))
      .agg(sum(col("tf")).as("cr"),
        sum(when(col("_t"), col("tf")).otherwise(lit(0L))).as("ct"))
    val tot = btab.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val am = alpha * m
    val lr = btab.crossJoin(broadcast(tot)) // 1-row scalar, not cartesian
      .select(col("b"),
        (log((col("ct").cast("double") + alpha) /
             (col("nt").cast("double") + am)) -
         log((col("cr").cast("double") + alpha) /
             (col("nr").cast("double") + am))).as("lr"))
    val contrib = tf.join(broadcast(lr), Seq("b")) // m rows: broadcast
      .withColumn("c", col("tf").cast("double") * col("lr"))
    val summed = contrib.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_feats"),
        aggregate(sort_array(collect_list(struct(col("b"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("lw"))
    val result = base.select(col("doc_id"), col("_t").as("is_target"))
      .join(summed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("lw"), lit(0.0)).as("log_weight"))
    if (cache) {
      val out = result.localCheckpoint(true)
      tf.unpersist()
      out
    } else result
  }

  /** Draw `k` documents without replacement with P ∝ exp(log_weight)
    * from a [[score]] frame: Gumbel-top-k with the Gumbel noise
    * derived from md5(doc_id, salt) — deterministic, oracle-exact.
    * Returns (doc_id, is_target, n_feats, log_weight, rank). */
  def resample(scored: DataFrame, k: Int, salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val twoTo60 = 1152921504606846976.0 // 2^60, exact as a double
    val keyed = scored.withColumn("_u",
        (Splits.md5Long(concat(col("doc_id").cast("string"), lit(salt)))
          .cast("double") + 0.5) / twoTo60)
      .withColumn("_key", col("log_weight") - log(-log(col("_u"))))
    graft.operators.TopK.topKPerKey(keyed, Seq(lit(1).as("_g")),
        struct(col("_key"), col("doc_id"), col("is_target"),
          col("n_feats"), col("log_weight")), k)
      .select(col("_row.doc_id").as("doc_id"),
        col("_row.is_target").as("is_target"),
        col("_row.n_feats").as("n_feats"),
        col("_row.log_weight").as("log_weight"), col("rank"))
  }
}
