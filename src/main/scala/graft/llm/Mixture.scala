package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture downsampling — reshape a corpus toward declared
  * per-stratum mixture weights (the DoReMi/Pile-style knob: "train on
  * 4 parts English to 1 part Chinese", "cap web text at 3x books").
  * Deletion-only: the largest sample satisfying the target ratios keeps
  * ALL of the bottleneck stratum (the one most under target) and
  * deterministically downsamples every other stratum toward it.
  *
  * Rates are derived, not guessed: with n_s rows per stratum and weight
  * w_s, the bottleneck b minimizes n_s/w_s, and stratum s keeps
  * floor(1000 * w_s * n_b / (w_b * n_s)) per mille of its rows via
  * [[Splits.hashSample]] — so kept_s/kept_b ≈ w_s/w_b with the
  * per-mille quantization error, and the selection inherits
  * hashSample's guarantees: no RNG, stable under repartitioning and
  * AQE, nested across salts, exactly mirrorable by the DuckDB oracle.
  *
  * Scale shape: one map-combinable groupBy over the stratum column
  * (output = #strata rows, a dimension table), a LIMIT-1 sort of that
  * dimension table to find the bottleneck, a broadcast join of the
  * per-stratum rates back onto the corpus, and a map-side sampling
  * predicate — no data-sized shuffle, no driver collect. Strata
  * absent from `weights` are dropped (weight zero).
  *
  * Both sides of the oracle compute the rate with IEEE double division
  * then floor — bit-identical given identical integer inputs — and
  * break bottleneck ties (equal n/w) on the stratum value.
  */
object Mixture {

  def sampleToMixture(docs: DataFrame, id: Column, stratum: Column,
                      weights: Map[String, Int], salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    require(weights.values.forall(_ > 0), s"weights must be positive: $weights")
    Seq("_mix_stratum", "_mix_pm").foreach { c =>
      require(!docs.columns.contains(c),
        s"input must not contain the reserved column $c")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toSeq.sortBy(_._1).toDF("_mix_stratum", "_mix_w")
    val counts = docs.groupBy(stratum.as("_mix_stratum"))
      .agg(count(lit(1)).as("_mix_n"))
    // inner join: strata without a declared weight leave the corpus here
    val cw = counts.join(w, "_mix_stratum")
    val b = cw
      .orderBy(col("_mix_n") * lit(1.0) / col("_mix_w"), col("_mix_stratum"))
      .limit(1)
      .select(col("_mix_n").as("_mix_nb"), col("_mix_w").as("_mix_wb"))
    val rates = cw.crossJoin(broadcast(b))
      .select(col("_mix_stratum"),
        floor(lit(1000.0) * col("_mix_w") * col("_mix_nb") /
          (col("_mix_wb") * col("_mix_n"))).cast("int").as("_mix_pm"))
    docs.withColumn("_mix_stratum", stratum)
      .join(broadcast(rates), "_mix_stratum")
      .where(Splits.hashSample(id, col("_mix_pm"), salt))
      .drop("_mix_stratum", "_mix_pm")
  }

  /** Temperature-smoothed mixture (the multilingual-sampling knob of
    * mBERT/XLM-R/mT5: sample stratum s with probability ∝ p_s^alpha,
    * p_s = n_s/N): deletion-only realization keeping
    * floor(1000 · (n_b/n_s)^(1-alpha)) per mille of stratum s, where b
    * is the bottleneck stratum — the one whose target/size ratio is
    * largest, i.e. min n_s for alpha < 1 (small strata pass WHOLE, big
    * strata flatten toward them) and max n_s for alpha > 1 (sharpen).
    * alpha = 1 keeps everything; alpha = 0 is a uniform per-stratum cap.
    *
    * Same scale shape as [[sampleToMixture]]: one map-combinable
    * dimension groupBy, a LIMIT-1 sort of the dimension table, a
    * broadcast rate join, and the q51 map-side md5 predicate — no RNG,
    * no data-sized shuffle, AQE/re-run stable.
    *
    * Cross-engine determinism of the floor boundary: the bottleneck is
    * chosen by ORDERING on (n_s, stratum) — monotone in n_s^(1-alpha),
    * so no pow enters the comparison — and for alpha = 0.5 (the common
    * T=2 setting, used by the q124 gate) the rate is computed with
    * `sqrt`, which is IEEE-correctly-rounded in both engines, unlike
    * libm `pow` whose last ulp may differ. Other alphas use `pow` and
    * carry that caveat (documented, spec-covered, not oracle-gated). */
  def temperatureSample(docs: DataFrame, id: Column, stratum: Column,
                        alpha: Double, salt: String = ""): DataFrame = {
    require(alpha >= 0.0, s"alpha must be non-negative: $alpha")
    Seq("_mix_stratum", "_mix_stratum_r", "_mix_pm").foreach { c =>
      require(!docs.columns.contains(c),
        s"input must not contain the reserved column $c")
    }
    val counts = docs.groupBy(stratum.as("_mix_stratum"))
      .agg(count(lit(1)).as("_mix_n"))
    val b = counts
      .orderBy(if (alpha <= 1.0) col("_mix_n").asc else col("_mix_n").desc,
        col("_mix_stratum"))
      .limit(1)
      .select(col("_mix_n").as("_mix_nb"))
    val ratio = col("_mix_nb").cast("double") / col("_mix_n").cast("double")
    val shrink = // (n_b/n_s)^(1-alpha); exact-sqrt fast path at alpha=0.5
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(b))
      .select(col("_mix_stratum").as("_mix_stratum_r"),
        least(lit(1000), floor(lit(1000.0) * shrink).cast("int")).as("_mix_pm"))
    // null-safe join: a NULL stratum is a stratum like any other (it
    // groupBy-counts as one), so it must rate-join too — a plain equi
    // join would silently drop every unlabeled row, breaking the
    // "alpha = 1 keeps everything" law
    docs.withColumn("_mix_stratum", stratum)
      .join(broadcast(rates), col("_mix_stratum") <=> col("_mix_stratum_r"))
      .where(Splits.hashSample(id, col("_mix_pm"), salt))
      .drop("_mix_stratum", "_mix_stratum_r", "_mix_pm")
  }
}
