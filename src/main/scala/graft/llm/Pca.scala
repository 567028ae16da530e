package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality
  * step in front of the vector pipeline (whitening, reduced-dimension
  * ANN, OPQ-style rotations all start from the same two moments).
  *
  * The 100 TB shape is the classic one (Spark MLlib's RowMatrix does
  * the same split): the data-sized work is ONE pass that folds every
  * row into the d×d second-moment (Gram) matrix plus the d first
  * moments — map-side combined, so the shuffle carries
  * O(partitions × d²) rows, never the corpus — and the eigensolve
  * runs on the driver over the collected d×d matrix (d is a model
  * constant: 4096 doubles at d=64; O(d³) work, microscopic next to
  * the scan).
  *
  * To make the corpus-sized half oracle-gateable, [[gramInt8]]
  * accumulates over the int8-QUANTIZED vectors
  * ([[Similarity.quantizeInt8]], q72's compressor): every product and
  * sum is an exact integer, so the fold is order-independent and
  * hash-matches DuckDB bit-for-bit — the same reason
  * `operators/IntStats` keeps its moments in longs (floating Gram
  * sums are partition-order dependent and could never hash-gate).
  * |q_i| ≤ 127 bounds every product at 16129, so the BIGINT sums hold
  * ~5.7e14 rows before overflow — beyond any real corpus.
  *
  * The driver-side continuation ([[covariance]] → [[topComponents]] →
  * [[project]]) is deterministic double math over those exact
  * integers: fixed-iteration power iteration with Gram–Schmidt
  * deflation (no RNG — the start vector is a fixed ramp), then a
  * zero-shuffle per-row projection. Spec-gated (PcaSpec): a planted
  * dominant direction is recovered, components are orthonormal, and
  * projected variance decreases across components.
  */
object Pca {

  /** One-pass exact integer Gram/moment accumulation over the int8
    * quantization of `embedding`. Output grid, `d` the vector width:
    *  - `(di, dj, g)` with `0 ≤ di ≤ dj < d`: Σ q_di·q_dj (upper
    *    triangle of the second-moment matrix);
    *  - `(di, -1, g)`: Σ q_di (first moments);
    *  - `(-1, -1, g)`: the row count.
    * The fold is [[graft.expressions.GramAggExpr]], a native
    * `TypedImperativeAggregate` whose buffer is one primitive long
    * array: the per-row cost is d(d+1)/2 multiply-adds in place, the
    * exchange carries one O(d²) buffer per input partition, and the
    * final grid is unpacked once. (The previous shape — explode every
    * row into d(d+1)/2+d+1 structs and hash-aggregate them — built and
    * shuffled ~2 145 struct rows per input row at d=64; same output,
    * ~50× slower.) */
  def gramInt8(vecs: DataFrame): DataFrame =
    vecs.select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .agg(call_function("gram_agg", col("q")).as("cells"))
      .select(explode(col("cells")).as("t"))
      .select(col("t.di").as("di"), col("t.dj").as("dj"),
        col("t.g").as("g"))

  /** Merge independently-computed [[gramInt8]] grids by adding their
    * cells — the incremental-maintenance face of the Gram split: a
    * daily pipeline grams only the DELTA batch and folds it into the
    * stored grid at O(d²) cost, instead of re-scanning the corpus.
    * Exactness is the point of the integer domain: merged partial
    * states equal the one-shot grid bit-for-bit whatever the batch
    * split (the q148 materialized-view property; floating Gram sums
    * could never guarantee this). */
  def mergeGrams(grids: Seq[DataFrame]): DataFrame =
    grids.reduce(_ unionByName _)
      .groupBy("di", "dj").agg(sum(col("g")).as("g"))

  /** Dense covariance matrix from [[gramInt8]]'s collected grid
    * (exact integers → deterministic doubles):
    * C[i][j] = G_ij/n − (s_i/n)(s_j/n). */
  def covariance(grid: Seq[(Long, Long, Long)]): Array[Array[Double]] = {
    val byKey = grid.map { case (i, j, g) => (i, j) -> g }.toMap
    val n = byKey.getOrElse((-1L, -1L), 0L).toDouble
    require(n > 0, "covariance needs at least one row")
    val d = (grid.map(_._1).max + 1).toInt
    val mean = Array.tabulate(d)(i => byKey((i.toLong, -1L)) / n)
    Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = (math.min(i, j).toLong, math.max(i, j).toLong)
      byKey((lo, hi)) / n - mean(i) * mean(j)
    }
  }

  /** Top-`r` principal components of a symmetric matrix by fixed-count
    * power iteration with Gram–Schmidt deflation. Deterministic: the
    * start vector is a fixed ramp (1, 1.001, 1.002, …) normalized —
    * symmetry-breaking without RNG. Returns unit-norm rows. */
  def topComponents(cov: Array[Array[Double]], r: Int,
                    iters: Int = 100): Seq[Array[Double]] = {
    val d = cov.length
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val comps = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    for (_ <- 0 until math.min(r, d)) {
      var v = Array.tabulate(d)(i => 1.0 + i * 0.001)
      for (_ <- 0 until iters) {
        val w = matVec(v)
        // deflate: remove already-found directions
        comps.foreach { c =>
          val dot = (0 until d).map(j => w(j) * c(j)).sum
          (0 until d).foreach(j => w(j) -= dot * c(j))
        }
        val nw = norm(w)
        v = if (nw > 0) w.map(_ / nw) else v
      }
      comps += v
    }
    comps.toSeq
  }

  /** Zero-shuffle projection of `embedding` onto literal components:
    * one `pc<k>` double column per component (dot in fixed
    * left-to-right order). */
  def project(vecs: DataFrame, comps: Seq[Array[Double]]): DataFrame =
    comps.zipWithIndex.foldLeft(vecs) { case (df, (c, k)) =>
      val lits = array(c.map(x => lit(x)).toIndexedSeq: _*)
      df.withColumn(s"pc${k + 1}",
        aggregate(zip_with(col("embedding"), lits,
          (x, w) => x.cast("double") * w), lit(0.0), (a, x) => a + x))
    }
}
