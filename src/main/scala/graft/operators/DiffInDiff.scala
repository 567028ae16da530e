package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Difference-in-differences over a panel of unit-period observations
  * (Card & Krueger '94's design) — the experiment-measurement shape:
  * a naive treated-vs-control comparison confounds group composition,
  * a naive post-vs-pre comparison confounds time trend; DiD =
  * (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre) removes
  * both under parallel trends.
  *
  * Exactness: each cell mean lives on the ppm grid
  * (⌊10⁶·Σy/n⌋ — integral division of exact Long sums), and the DiD
  * estimate is the integer difference of differences of those grid
  * means — deterministic, hash-gateable; the grid truncation is the
  * documented price (≤ 4 ppm absolute).
  *
  * Scale shape: one integer groupBy from observations to the 4-row
  * cell table, eagerly checkpointed before the estimate crossJoin
  * (the q191 normalizer discipline). Output: the four cells
  * `(treated, post, n_obs, sum_y, mean_ppm)` each carrying
  * `did_ppm` (gate-column style). */
object DiffInDiff {

  def estimate(obs: DataFrame, treated: Column, post: Column,
               y: Column): DataFrame = {
    val cells = obs
      .select(treated.cast("boolean").as("treated"),
        post.cast("boolean").as("post"), y.cast("long").as("y"))
      .groupBy("treated", "post")
      .agg(count(lit(1)).as("n_obs"), sum("y").as("sum_y"))
      .withColumn("mean_ppm",
        expr("(1000000L * sum_y) div greatest(n_obs, 1L)"))
      .localCheckpoint(true)
    def cell(t: Boolean, p: Boolean) =
      max(when(col("treated") === t && col("post") === p,
        col("mean_ppm")))
    val did = cells.agg(
      ((cell(true, true) - cell(true, false)) -
        (cell(false, true) - cell(false, false))).as("did_ppm"))
    cells.crossJoin(broadcast(did))
  }
}
