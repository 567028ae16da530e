package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitext mining — margin-based parallel-pair extraction between two
  * embedding sets (Artetxe & Schwenk '19, the CCMatrix/LASER recipe):
  * absolute cosine over-accepts in dense regions and under-accepts in
  * sparse ones, so each candidate pair (x, y) is scored by the RATIO
  * margin
  *
  *   margin(x, y) = cos(x, y) / ( (Σ_{z∈NNk(x)} cos(x, z) +
  *                                 Σ_{z∈NNk(y)} cos(y, z)) / 2k )
  *
  * — the best match relative to each side's local similarity level —
  * and a pair is accepted only when it is the MUTUAL best match AND
  * its margin clears the threshold.
  *
  * [[mine]] is the exact arm (and the oracle anchor): the smaller side
  * broadcasts, every (a, b) pair is scored once, and the four window
  * quantities (both ranks, both top-k sums) ride TWO exchanges — all
  * a-side windows share the a_id partitioning, all b-side windows the
  * b_id one; nothing is re-scored. At 100 TB the same margin runs over
  * the ANN shortlist instead of the full product
  * ([[Similarity.multiProbeCandidatePairs]] supplies the candidates;
  * the margin layer is unchanged) — the exact arm is the acceptance
  * baseline that gate such a deployment, q147-style.
  *
  * All quantities are exact integers (floor-ppm cosines, long sums,
  * one floor of a long-derived double ratio), so the mined pairs AND
  * their margins hash-gate against DuckDB.
  */
object Bitext {

  /** Mine the best b-side match for every a-side vector. Output per
    * a-side vector: the top match, its cosine, both neighborhood sums,
    * the ratio margin (ppm), the mutual-best flag, and `accepted`. */
  def mine(vecs: DataFrame, sideA: Column, k: Int,
           marginThresholdPpm: Long): DataFrame = {
    val a = vecs.filter(sideA)
      .select(col("vec_id").as("a_id"), col("embedding").as("ae"))
    val b = vecs.filter(!sideA)
      .select(col("vec_id").as("b_id"), col("embedding").as("be"))
    val scored = a.crossJoin(broadcast(b))
      .select(col("a_id"), col("b_id"),
        floor(lit(1000000.0) *
          round(Similarity.cosineD(col("ae"), col("be")), 6))
          .cast("long").as("cos_ppm"))
    val wA = Window.partitionBy("a_id").orderBy(col("cos_ppm").desc, col("b_id"))
    val wB = Window.partitionBy("b_id").orderBy(col("cos_ppm").desc, col("a_id"))
    scored
      // a-side rank + conditional top-k sum: one exchange on a_id
      .withColumn("rk_a", row_number().over(wA).cast("long"))
      .withColumn("sum_nn_a",
        sum(when(col("rk_a") <= k, col("cos_ppm")))
          .over(Window.partitionBy("a_id")))
      // b-side rank + sum: one exchange on b_id
      .withColumn("rk_b", row_number().over(wB).cast("long"))
      .withColumn("sum_nn_b",
        sum(when(col("rk_b") <= k, col("cos_ppm")))
          .over(Window.partitionBy("b_id")))
      .where(col("rk_a") === 1L)
      .withColumn("margin_ppm",
        floor(lit(1000000.0) * (lit(2L * k) * col("cos_ppm")).cast("double")
          / greatest(col("sum_nn_a") + col("sum_nn_b"), lit(1L))
            .cast("double")).cast("long"))
      .withColumn("mutual", col("rk_b") === 1L)
      .withColumn("accepted",
        col("mutual") && col("margin_ppm") >= marginThresholdPpm)
      .select("a_id", "b_id", "cos_ppm", "sum_nn_a", "sum_nn_b",
        "margin_ppm", "mutual", "accepted")
  }
}
