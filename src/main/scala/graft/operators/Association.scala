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
  * volume Σ size²), two integer groupBys, a 1-row broadcast for N, and
  * a per-item window for the top-k. No collect. The Σ size² bound is
  * only real because of `maxBasketSize`: one degenerate basket with 10⁶
  * items would alone generate 10¹² candidate pairs (the hub shape
  * [[graft.llm.Triangles]] orients away from), so baskets above the cap
  * are EXCLUDED WHOLE before any pair is formed — from the pair join,
  * the item counts, and N alike, keeping lift a consistent statistic
  * over the surviving basket population. Order-shaped baskets never hit
  * the default cap; a corpus with legitimately huge baskets needs a
  * heavy/light decomposition (the q164 skew-join shape), not raw pairs.
  */
object Association {

  /** Symmetrized top-k association partners per item:
    * `(item, partner, n_co, n_item, n_partner, n_baskets, lift_ppm,
    * rank)` for pairs co-occurring in ≥ `minCo` baskets. Baskets with
    * more than `maxBasketSize` distinct items are dropped whole (see
    * the object doc — the O(Σ size²) pair-volume guard). */
  def liftPairs(baskets: DataFrame, basket: Column, item: Column,
                minCo: Int = 2, topK: Int = 3,
                maxBasketSize: Int = 10000): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must allow pairs: $maxBasketSize")
    val biAll = baskets
      .select(basket.cast("long").as("b"), item.cast("long").as("i"))
      .distinct()
    // basket-size gate: one map-combinable count per basket, inner-joined
    // back — an oversized basket contributes nothing anywhere
    val smallB = biAll.groupBy(col("b")).agg(count(lit(1)).as("_sz"))
      .where(col("_sz") <= maxBasketSize).select("b")
    val bi = biAll.join(smallB, "b")
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
