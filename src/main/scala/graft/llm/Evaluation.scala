package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ranking-quality metrics for a scored, labeled table — the
  * evaluation loop of the quality-classifier family ([[NaiveBayes]],
  * [[PerplexityBuckets]]): before a filter model gates 100 TB of
  * documents, its threshold is chosen off ranking metrics, and an
  * approximate AUC that drifts run-to-run makes regression tracking
  * impossible. Everything here is exact integer arithmetic over
  * integer scores (ties handled by average rank), so every metric
  * hash-gates.
  *
  * AUC via the Mann–Whitney U identity (Wilcoxon '45/Mann–Whitney
  * '47): AUC = U/(n⁺n⁻) with U = Σ_{pos} rank − n⁺(n⁺+1)/2 over ranks
  * in the combined score ordering, ties by average rank (the exact
  * probabilistic AUC: P(s⁺>s⁻) + ½P(s⁺=s⁻)). Doubled ranks
  * (2·avgrank = 2·rank_min + ties − 1) keep the half-integers in
  * Longs.
  *
  * Scale shape: one window pass per metric — rank within group is a
  * single hash-partitioned sort, the classic exact-AUC cost; the
  * reduction after it is map-combinable. No collect, no doubles.
  */
object Evaluation {

  /** Per-group exact AUC: `(group, n_pos, n_neg, u2, auc_ppm)` where
    * `u2` = 2·U (average-rank ties) and `auc_ppm` =
    * ⌊10⁶·U/(n⁺n⁻)⌋. Groups missing a class report auc_ppm 0. */
  def aucByGroup(scored: DataFrame, group: Column, score: Column,
                 label: Column): DataFrame = {
    val base = scored.select(group.as("grp"), score.cast("long").as("s"),
      label.as("y"))
    val ranked = base
      .withColumn("rmin", rank().over(Window.partitionBy("grp").orderBy("s")))
      .withColumn("nt", count(lit(1)).over(Window.partitionBy("grp", "s")))
      // 2 x average rank of this row in the combined ordering
      .withColumn("ar2", lit(2L) * col("rmin") + col("nt") - lit(1L))
    ranked.groupBy("grp")
      .agg(count(when(col("y"), 1)).as("n_pos"),
        count(when(!col("y"), 1)).as("n_neg"),
        sum(when(col("y"), col("ar2")).otherwise(0L)).as("r2"))
      .select(col("grp").as("group"), col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + lit(1L))).as("u2"))
      .withColumn("auc_ppm",
        expr("(1000000L * u2) div greatest(2L * n_pos * n_neg, 1L)"))
  }

  /** Per-group decile lift/gains table over the score ranking:
    * `(group, decile, n, n_pos, pos_rate_ppm, cum_pos, capture_ppm,
    * lift_ppm)`. Decile 0 holds the HIGHEST scores; rows tied on score
    * share a rank and therefore a decile, so bins can be uneven but
    * are deterministic. `capture_ppm` = share of all positives found
    * at this decile or better; `lift_ppm` = 10⁶ · (decile pos rate /
    * overall pos rate). */
  def liftTable(scored: DataFrame, group: Column, score: Column,
                label: Column): DataFrame = {
    val base = scored.select(group.as("grp"), score.cast("long").as("s"),
      label.as("y"))
    val ranked = base
      .withColumn("rmin",
        rank().over(Window.partitionBy("grp").orderBy(col("s").desc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .withColumn("decile", expr("(10L * (rmin - 1L)) div n"))
    val bins = ranked.groupBy(col("grp"), col("decile"))
      .agg(count(lit(1)).as("n"),
        count(when(col("y"), 1)).as("n_pos"))
    val tot = bins.groupBy("grp")
      .agg(sum("n").as("nt"), sum("n_pos").as("pt"))
    bins.join(tot, "grp")
      .withColumn("cum_pos", sum("n_pos").over(
        Window.partitionBy("grp").orderBy("decile")))
      .select(col("grp").as("group"), col("decile"), col("n"), col("n_pos"),
        expr("(1000000L * n_pos) div greatest(n, 1L)").as("pos_rate_ppm"),
        col("cum_pos"),
        expr("(1000000L * cum_pos) div greatest(pt, 1L)").as("capture_ppm"),
        expr("(1000000L * n_pos * nt) div greatest(n * pt, 1L)")
          .as("lift_ppm"))
  }
}
