package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association statistics — exact-integer lift over
  * co-occurrence pairs (Agrawal et al. '93 support/confidence family;
  * lift = P(i,j)/(P(i)P(j)) is the pointwise-mutual-information ratio
  * before the log). Raw co-occurrence counts confound popularity with
  * affinity — two universally-bought items co-occur constantly at lift
  * ≈ 1; lift > 1 is genuine association. The statistical complement of
  * the structural co-purchase graph (q190's k-core input).
  *
  * Everything is a ratio of exact Long counts: `lift_ppm` =
  * ⌊10⁶·c_ij·N / (c_i·c_j)⌋ — deterministic, hash-gateable, no
  * doubles. Top-k partners per item are ordered by (lift_ppm DESC,
  * partner ASC): ranking on the ppm grid, ties broken by id —
  * documented grid semantics, bit-stable on both engines.
  *
  * Scale shape: one distinct + one bounded per-basket self-join (pair
  * volume Σ size² — basket sizes are bounded in practice; a pathological
  * mega-basket needs a size cap upstream), two integer groupBys, a
  * 1-row broadcast for N, and a per-item window for the top-k. No
  * collect.
  */
object Association {

  /** Symmetrized top-k association partners per item:
    * `(item, partner, n_co, n_item, n_partner, n_baskets, lift_ppm,
    * rank)` for pairs co-occurring in ≥ `minCo` baskets. */
  def liftPairs(baskets: DataFrame, basket: Column, item: Column,
                minCo: Int = 2, topK: Int = 3): DataFrame = {
    val bi = baskets
      .select(basket.cast("long").as("b"), item.cast("long").as("i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = bi.select(countDistinct(col("b")).as("n_baskets"))
    val ci = bi.groupBy(col("i")).agg(count(lit(1)).as("c"))
    val co = bi.as("a").join(bi.as("b2"),
        col("a.b") === col("b2.b") && col("a.i") < col("b2.i"))
      .groupBy(col("a.i").as("x"), col("b2.i").as("y"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCo)
    val sym = co.select(col("x").as("item"), col("y").as("partner"),
        col("n_co"))
      .union(co.select(col("y").as("item"), col("x").as("partner"),
        col("n_co")))
    val enriched = sym
      .join(ci.select(col("i").as("item"), col("c").as("n_item")), "item")
      .join(ci.select(col("i").as("partner"), col("c").as("n_partner")),
        "partner")
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm",
        expr("(1000000L * n_co * n_baskets) div (n_item * n_partner)"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("lift_ppm").desc, col("partner"))
    val out = enriched
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("item", "partner", "n_co", "n_item", "n_partner",
        "n_baskets", "lift_ppm", "rank")
      .localCheckpoint(true)
    bi.unpersist()
    out
  }
}
