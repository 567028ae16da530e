package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Splits

/** Poisson bootstrap — distributed error bars for corpus-level
  * metrics. The classic bootstrap resamples n rows WITH replacement B
  * times, which is uncomputable in one pass over a distributed table
  * (a true multinomial needs global coordination). The standard
  * large-scale substitute draws each row's multiplicity in each
  * replicate independently as Poisson(1) — for large n the replicate
  * distributions converge to the multinomial bootstrap's, and every
  * weight is a pure per-(row, replicate) function: one pass, no
  * coordination, map-side combinable.
  *
  * Determinism discipline (the [[graft.llm.Dsir]] precedent): the
  * Poisson draw inverts a fixed cutoff table of the Poisson(1) CDF on
  * a md5-derived uniform — `u = md5Long(id:b) / 2^60` — so there is
  * no RNG anywhere, the same row gets the same weight in both
  * engines, and the whole bootstrap (weights, replicate means, CI
  * bounds) hash-gates against the DuckDB oracle.
  *
  * Scale shape: the input explodes into B (replicate, w·x) terms per
  * row and folds straight into a hash aggregate keyed by the
  * replicate id — map-side combined, so the exchange carries B rows
  * per input partition (the [[graft.llm.Pca.gramInt8]] shape). The CI
  * layer then works on the B bounded replicate rows: sorted-array
  * percentile pick, broadcast back as a scalar — never an
  * unpartitioned window.
  */
object Bootstrap {

  /** Poisson(1) CDF cutoffs for multiplicities 0..6; a u above the
    * last cutoff (mass ~8.3e-5) draws 7. Literal doubles so both
    * engines compare identically. */
  val Cutoffs: Seq[Double] = {
    val pmf = (0 to 6).map { k =>
      math.exp(-1.0) / (1 to k).foldLeft(1.0)((a, i) => a * i)
    }
    pmf.scanLeft(0.0)(_ + _).drop(1)
  }

  private val TwoPow60 = 1152921504606846976.0 // 2^60

  /** Deterministic Poisson(1) multiplicity of row `id` in replicate
    * `b`: invert [[Cutoffs]] on the md5 uniform of "id:b". */
  def poissonWeight(id: Column, b: Column): Column = {
    val u = Splits.md5Long(concat(id.cast("string"), lit(":"),
      b.cast("string"))).cast("double") / lit(TwoPow60)
    Cutoffs.zipWithIndex.foldRight(lit(7L): Column) { case ((c, k), rest) =>
      when(u < c, lit(k.toLong)).otherwise(rest)
    }
  }

  /** Bootstrap CI for the mean of integer metric `x` over `df`:
    * B replicate rows, each with its effective sample size, weighted
    * sum, replicate mean (floor-ppm), the full-sample point estimate,
    * and the percentile CI bounds common to all rows. `lo`/`hi` are
    * 1-based ranks into the B sorted replicate means (e.g. B = 200,
    * lo = 5, hi = 196 → the central 95%). */
  def meanCi(df: DataFrame, id: Column, x: Column, b: Int,
             lo: Int, hi: Int): DataFrame = {
    require(b > 0 && lo >= 1 && hi <= b && lo <= hi,
      s"invalid bootstrap ranks: B=$b lo=$lo hi=$hi")
    val terms = df.select(id.cast("string").as("_id"),
        x.cast("long").as("_x"))
      .select(col("_id"), col("_x"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .select(col("b").cast("long").as("b"), col("_x"),
        poissonWeight(col("_id"), col("b")).as("w"))
    val reps = terms.groupBy("b").agg(
      sum(col("w")).as("n_eff"),
      sum(col("w") * col("_x")).as("sum_wx"))
      .withColumn("mean_ppm",
        floor(lit(1000000.0) * col("sum_wx").cast("double") /
          greatest(col("n_eff"), lit(1L)).cast("double")).cast("long"))
      // B bounded rows, read twice (CI layer + output join): persist so
      // the corpus-sized explode runs once; callers clearCache() after
      .persist()
    val point = df.agg(
      floor(lit(1000000.0) * sum(x.cast("long")).cast("double") /
        greatest(count(lit(1)), lit(1L)).cast("double"))
        .cast("long").as("point_ppm"))
    val ci = reps.agg(sort_array(collect_list(col("mean_ppm"))).as("ms"))
      .select(element_at(col("ms"), lo).as("ci_lo_ppm"),
        element_at(col("ms"), hi).as("ci_hi_ppm"))
    reps.crossJoin(broadcast(point)) // broadcast scalars, not cartesians
      .crossJoin(broadcast(ci))
      .withColumn("covered",
        col("point_ppm") >= col("ci_lo_ppm") &&
          col("point_ppm") <= col("ci_hi_ppm"))
  }
}
