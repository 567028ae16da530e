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
}
