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

  /** RBO@10 integer machinery (p = 9/10, depth 10, normalized to the
    * truncated maximum so identical rankings score exactly 10⁶ ppm).
    * An overlap pair first counted at depth m = max(rank_a, rank_b)
    * contributes to every depth d ≥ m, so its total weight is
    * W(m) = Σ_{d≥m} c_d with c_d = (1−p)·p^(d−1)/d brought to the
    * common denominator 10¹⁰·2520 (2520 = lcm(1..10)) and the shared
    * factor 4 cancelled to keep 10⁶·Σ inside a Long. All exact. */
  private val RboCoefs: IndexedSeq[Long] = (1 to 10).map { d =>
    def pw(base: Long, e: Int) = (1 to e).foldLeft(1L)((a, _) => a * base)
    pw(9L, d - 1) * pw(10L, 10 - d) * (2520L / d) / 4L
  }
  /** W(m), 1-indexed by m: suffix sums of the depth coefficients. */
  val RboWeights: IndexedSeq[Long] =
    RboCoefs.scanRight(0L)(_ + _).dropRight(1)
  /** Σ d·c_d — the score of two identical depth-10 rankings. */
  val RboMax: Long = RboWeights.sum

  /** Exact rank-biased overlap at depth 10 (Webber et al. '10,
    * truncated + normalized) between two rankings — the drift metric
    * for "did the index rebuild / scorer change move the results?":
    * top-weighted (rank-1 agreement counts ~15× rank-10), unlike
    * plain overlap. `a`, `b`: `(query_id, doc_id, rank)` with 1-based
    * ranks; rows beyond rank 10 are ignored. Output one row per query
    * seen in either ranking: `(query_id, n_common, rbo_num, rbo_ppm)`
    * with `rbo_ppm` = ⌊10⁶·RBO⌋ — 10⁶ iff the top-10s are identical
    * in order, 0 iff disjoint. One equi-join + one integer groupBy. */
  def rbo10(a: DataFrame, b: DataFrame): DataFrame = {
    def arm(df: DataFrame, rn: String) =
      df.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as(rn)).filter(col(rn) <= 10)
    val ra = arm(a, "r_a")
    val rb = arm(b, "r_b")
    val qs = ra.select("query_id").union(rb.select("query_id")).distinct()
    val ov = ra.join(rb, Seq("query_id", "doc_id"))
      .withColumn("w", element_at(
        array(RboWeights.map(lit): _*),
        greatest(col("r_a"), col("r_b")).cast("int")))
    val agg = ov.groupBy("query_id")
      .agg(count(lit(1)).as("n_common"), sum("w").as("rbo_num"))
    qs.join(agg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo_num"), lit(0L)).as("rbo_num"))
      .withColumn("rbo_ppm", expr(s"(rbo_num * 1000000L) div ${RboMax}L"))
  }

  /** Cohen's κ inter-judgment agreement (Cohen '60) — the quality
    * gate on the preference data itself, before [[BradleyTerry]]
    * aggregates it: raw percent-agreement rewards degenerate
    * always-same-answer judging; κ subtracts the agreement the two
    * judgments' own marginals would produce by chance. "Rater 1/2"
    * are the first two judgments per unit in the caller's
    * deterministic order (the outcome itself breaks residual ties, so
    * the assignment — and therefore the b/c split — is
    * order-stable); units with fewer than two judgments are skipped.
    * Exact: κ·ppm = ⌊10⁶·(N·(a+d) − Σ marginal products) /
    * (N² − Σ marginal products)⌋, all Longs, one row out. */
  def cohenKappa(judgments: DataFrame, unit: Column, outcome: Column,
                 order: Seq[Column]): DataFrame = {
    val base = judgments.select(unit.as("u"),
      outcome.cast("boolean").cast("int").as("o"),
      struct(order: _*).as("ord"))
    val seq = base.withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col("ord"), col("o"))))
      .filter(col("rn") <= 2)
    val pairs = seq.groupBy("u").agg(
        max(when(col("rn") === 1, col("o"))).as("r1"),
        max(when(col("rn") === 2, col("o"))).as("r2"))
      .filter(col("r2").isNotNull)
    pairs.agg(
        count(lit(1)).as("n_units"),
        count(when(col("r1") === 1 && col("r2") === 1, 1)).as("a"),
        count(when(col("r1") === 1 && col("r2") === 0, 1)).as("b"),
        count(when(col("r1") === 0 && col("r2") === 1, 1)).as("c"),
        count(when(col("r1") === 0 && col("r2") === 0, 1)).as("d"))
      .select(col("n_units"), col("a"), col("b"), col("c"), col("d"),
        expr("(1000000L * (a + d)) div greatest(n_units, 1L)")
          .as("po_ppm"),
        expr("""CASE WHEN n_units * n_units -
                  ((a + b) * (a + c) + (c + d) * (b + d)) > 0L
                THEN (1000000L * (n_units * (a + d) -
                  ((a + b) * (a + c) + (c + d) * (b + d))))
                  div (n_units * n_units -
                  ((a + b) * (a + c) + (c + d) * (b + d)))
                ELSE 0L END""").as("kappa_ppm"))
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
