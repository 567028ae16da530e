package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means over embedding columns — the
  * clustering primitive corpus curation runs on top of (topic-balanced
  * mixing, per-cluster sampling caps, semantic-coverage reports; the
  * Lloyd refinement of the IVF coarse quantizer in [[Similarity]]).
  *
  * Everything is pinned so the DuckDB oracle can replay it exactly:
  *
  *  - seed = the [[Similarity.centroidSeq]] md5-ordered sample (no RNG);
  *  - assignment = argmax of dot(e, c)/‖c‖ (ties → lowest cell id) via
  *    the native `top_cells` expression — scale-invariant in c, so the
  *    un-normalized mean centroid gives the same argmax as the true
  *    spherical-k-means mean direction;
  *  - centroid update = per-(cell, dim) mean over FIXED-POINT
  *    components: each float is quantized once to a 1e-7 grid
  *    (`floor(v * 1e7)` as a long — deterministic IEEE ops, and the
  *    grid is finer than float's own precision near |v|≈1, so nothing
  *    real is lost) and the longs sum EXACTLY and order-independently —
  *    the mean needs no sorted fold, no per-cell arrays, and no pinned
  *    shuffle order (how a bit-stable global mean scales where
  *    PageRank's per-node sorted folds cannot; a DECIMAL sum is exact
  *    too, but float→decimal TIE rounding differs between engines on
  *    dyadic values — integer quantization has no ties to round);
  *  - an emptied cell keeps its previous centroid.
  *
  * Scale shape per iteration: one codegen assignment pass (centroids
  * broadcast as literals, k·dims doubles), one map-combinable
  * (cell, dim) aggregate whose post-shuffle size is k·dims rows, and a
  * bounded k·dims driver collect (the IVF codebook precedent). No
  * all-pairs stage, no per-group state proportional to cluster size.
  */
object KMeans {

  val K = 8
  val Iters = 3

  /** Final per-vector assignment after `iters` Lloyd rounds:
    * `(vec_id, cell)`. */
  def assign(vecs: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val cents = fitCentroids(vecs, k, iters)
    Similarity.assignCells(vecs, cents).select(col("vec_id"), col("cell"))
  }

  /** The refined centroid matrix after `iters` rounds (cell-id order). */
  def fitCentroids(vecs: DataFrame, k: Int = K, iters: Int = Iters): Seq[Seq[Double]] = {
    require(k >= 1 && iters >= 0, s"bad k=$k iters=$iters")
    var cents = Similarity.centroidSeq(vecs, k)
    // empty corpus slice: no seeds, no rounds, no clusters — a job
    // running over an empty day partition must produce zero rows, not
    // crash on `cents.head` inside the Lloyd step
    if (cents.isEmpty) return Seq.empty
    for (_ <- 1 to iters) cents = step(vecs, cents)
    cents
  }

  /** Fixed-point grid: finer than float precision at |v|≈1, coarse
    * enough that k·dims·N sums stay far inside Long. */
  val FixedPointScale = 1e7

  /** The un-collected (cell, dim, m) aggregate of one Lloyd round —
    * exposed for PlanSpec's exchange-budget assertion. */
  private[graft] def meansPlan(vecs: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame =
    Similarity.assignCells(vecs, cents)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(
        // the quantized longs ride a DECIMAL(38,0) sum: still exact
        // integers (no ties to round), and 38 digits cannot overflow at
        // any row count a cluster will see (a Long sum could at ~1e12
        // rows x 1e7 grid). DuckDB's BIGINT sum is HUGEINT — same width.
        (sum(floor(col("v").cast("double") * lit(FixedPointScale))
          .cast("decimal(38,0)")).cast("double") /
          (count(lit(1)).cast("double") * lit(FixedPointScale))).as("m"))

  /** One Lloyd round: assign to `cents`, return the fixed-point-exact
    * mean per cell (k·dims collect, bounded). */
  private[llm] def step(vecs: DataFrame, cents: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val dims = cents.head.length
    val means = meansPlan(vecs, cents)
      .collect()
      .map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
      .groupBy(_._1)
      .map { case (cell, rows) =>
        cell -> rows.map(_._2).sortBy(_._1).map(_._2).toSeq
      }
    cents.indices.map(c => means.getOrElse(c, cents(c))).map { v =>
      require(v.length == dims, s"centroid dim drift: ${v.length} != $dims")
      v
    }
  }

  /** Gate-friendly cluster report: one row per (cell, dim) with the
    * final centroid component plus integer per-cell stats (count and
    * vec_id checksum — any assignment swap flips an exact integer). */
  def report(spark: SparkSession, vecs: DataFrame, k: Int = K,
      iters: Int = Iters): DataFrame = {
    import spark.implicits._
    val cents = fitCentroids(vecs, k, iters)
    val asn = Similarity.assignCells(vecs, cents)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_vec_id"))
    val centRows = cents.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, d) => (c, d, x) }
    }.toDF("cell", "dim", "centroid")
    centRows.join(asn, Seq("cell"), "left")
      .select(col("cell").cast("long").as("cell"),
        col("dim").cast("long").as("dim"),
        // raw double: every op producing it is IEEE-deterministic and
        // identically ordered in the oracle, so the bits match — no
        // rounding (and no tie-rule exposure) needed
        col("centroid"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        coalesce(col("sum_vec_id"), lit(0L)).as("sum_vec_id"))
  }
}
