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

  /** DoReMi-style LEARNED domain weights (Xie et al. 2023, the public
    * method re-derived): where [[sampleToMixture]] consumes DECLARED
    * weights, this derives them from measured per-domain difficulty —
    * multiplicative-weights ascent on each domain's EXCESS LOSS, so
    * domains the current model finds hardest (highest cross-entropy
    * above the corpus mean) are upweighted, the Group-DRO update
    * DoReMi instantiates. The loss proxy is the corpus's own
    * [[BigramLm]] (the q175 scorer — no external model), so the whole
    * stage measures, reweights, and reports in one job.
    *
    * Determinism is the design constraint (the q176 Markov
    * discipline): all iteration state is EXACT Longs — per-doc
    * ×10⁴-integer cross-entropies sum per domain, means land in
    * micro-units by truncating division, and each of the `rounds`
    * updates is `w ← w · (10⁶ + clamp(excess/η⁻¹, ±ppm))` renormalized
    * by truncating integer division (the classic (1+ηx)
    * multiplicative-weights form — affine in exact integers, where
    * exp(ηx) would drag bit-fragile doubles through 8 rounds). Scala's
    * truncating `Long./` and DuckDB's `//` agree on negatives, so the
    * oracle unrolls the identical rounds.
    *
    * Scale shape: the corpus-sized work is ONE BigramLm scoring pass;
    * everything after is a domains-bounded dimension table collected
    * driver-side (documented bounded collect) and O(D · rounds) Long
    * arithmetic. Output, one row per domain: `(domain, n_docs,
    * sum_xent, mean_micro, excess, w0_ppm, w_ppm, gate_mass,
    * gate_hardest_up)` — gate_mass bounds the renormalized total in
    * (10⁶ − D, 10⁶]; gate_hardest_up asserts the hardest domain ended
    * at or above uniform. */
  def doremiWeights(docs: DataFrame, id: Column, text: Column,
                    domain: Column, rounds: Int = 8): DataFrame = {
    require(rounds >= 1, s"rounds must be positive: $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = BigramLm.score(docs, id, text)
      .join(docs.select(id.as("doc_id"), domain.as("_dom")), "doc_id")
      .filter(col("n_bigrams") > 0)
      .withColumn("xent_i", round(col("xent") * lit(10000)).cast("long"))
    val dom = scored.groupBy(col("_dom"))
      .agg(count(lit(1)).as("n"), sum(col("xent_i")).as("sx"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    if (dom.isEmpty)
      return Seq.empty[(String, Long, Long, Long, Long, Long, Long,
        Boolean, Boolean)].toDF("domain", "n_docs", "sum_xent",
        "mean_micro", "excess", "w0_ppm", "w_ppm", "gate_mass",
        "gate_hardest_up")
    val d = dom.length
    val (ts, tn) = (dom.map(_._3).sum, dom.map(_._2).sum)
    val globalMicro = ts * 100L / tn
    val meanMicro = dom.map { case (_, n, sx) => sx * 100L / n }
    val excess = meanMicro.map(_ - globalMicro)
    val w0 = 1000000L / d
    var w = Array.fill(d)(w0)
    for (_ <- 1 to rounds) {
      val u = Array.tabulate(d) { i =>
        val f = 1000000L + math.max(-500000L, math.min(500000L, excess(i) / 4L))
        w(i) * f
      }
      val s = u.sum
      w = u.map(_ * 1000000L / s)
    }
    val mass = w.sum
    val gateMass = mass <= 1000000L && mass > 1000000L - d
    // hardest domain: max excess, SMALLEST domain name breaking ties
    // (the oracle's ORDER BY excess DESC, domain LIMIT 1)
    val hardest = dom.indices.minBy(i => (-excess(i), dom(i)._1))
    val gateHardest = w(hardest) >= w0
    dom.indices.map { i =>
      (dom(i)._1, dom(i)._2, dom(i)._3, meanMicro(i), excess(i), w0,
        w(i), gateMass, gateHardest)
    }.toDF("domain", "n_docs", "sum_xent", "mean_micro", "excess",
      "w0_ppm", "w_ppm", "gate_mass", "gate_hardest_up")
  }
}
