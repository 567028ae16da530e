package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic unigram negative-sampling table — word2vec's
  * count^(3/4)-smoothed distribution (Mikolov et al. '13: raw counts
  * oversample stopwords, uniform oversamples typos; the 3/4 power is
  * the published sweet spot), materialized as K stratified CDF probes
  * so contrastive training reads its negatives as a plain table with
  * zero RNG anywhere.
  *
  * Exactness: the smoothed weight is the nested integer radical
  * w = ⌊√⌊√(n³)⌋⌋ = ⌊n^(3/4)⌋ (the floor-radical identity); n³ is
  * exact in a double up to n ≤ 2⁵³ᐟ³ ≈ 2·10⁵ and IEEE-correctly-
  * rounded sqrt is bit-identical across engines either way, so the
  * table hash-gates. Probe k targets t_k = ⌊k·W/K⌋ over total weight
  * W and lands on the unique vocab row whose cumulative interval
  * [cum−w, cum) contains t_k.
  *
  * Scale shape: one corpus explode + integer groupBy to the
  * vocab-bounded count table; the CDF is a TWO-PHASE prefix sum —
  * cum within first-character groups (binary collation makes
  * (first-char, token) order identical to token order) plus a
  * group-offset join, the per-group offset table being one row per
  * distinct leading character (alphabet-bounded) — no corpus-sized
  * single-partition window; the probe lookup is the [[graft.operators.AsOfJoin]]
  * single-exchange composition.
  */
object NegativeSampling {

  /** `(k, t, token, n, w)` — K rows, probe k landing on its CDF
    * interval owner. `minCount` prunes the vocab tail first. */
  def sampleTable(docs: DataFrame, text: Column, k: Int,
                  minCount: Long = 1L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(TextOps.lowerTokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val weighted = counts.withColumn("w",
      floor(sqrt(floor(sqrt((col("n") * col("n") * col("n"))
        .cast("double"))))).cast("long"))
    // two-phase prefix sum in token order: within-group cum + offsets
    val grouped = weighted.withColumn("g", substring(col("token"), 1, 1))
      .withColumn("cum_in",
        sum("w").over(Window.partitionBy("g").orderBy("token")))
    // alphabet-bounded (one row per distinct leading character): the
    // offset is a theta self-join, not a global-order window — no
    // single-partition sort anywhere in the operator
    val groupSums = grouped.groupBy("g").agg(sum("w").as("gw"))
    val offsets = groupSums.as("l")
      .join(groupSums.as("r"), col("r.g") < col("l.g"), "left")
      .groupBy(col("l.g").as("g"))
      .agg(coalesce(sum(col("r.gw")), lit(0L)).as("off"))
    // right side keyed like the probes; its "t" is the interval lower
    // bound cum − w, so the as-of match (latest lo ≤ t_k) is exactly
    // the unique interval owner — intervals partition [0, W)
    val cdf = grouped.join(broadcast(offsets), "g")
      .select(lit(0).as("_g"),
        (col("cum_in") + col("off") - col("w")).as("t"),
        col("token"), col("n"), col("w"))
    val total = weighted.agg(sum("w").as("wt"))
    val probes = spark.range(k.toLong).toDF("k")
      .crossJoin(broadcast(total))
      .select(col("k"), expr(s"(k * wt) div ${k}L").as("t"),
        lit(0).as("_g"))
    graft.operators.AsOfJoin.asofJoin(probes, cdf,
        key = "_g", ts = "t", payload = Seq("token", "n", "w"))
      .select(col("k"), col("t"), col("token"), col("n"), col("w"))
  }
}
