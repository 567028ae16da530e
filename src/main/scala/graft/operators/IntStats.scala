package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic statistics from INTEGER moment sums.
  *
  * Spark's floating aggregates (`corr`, `covar_samp`, `stddev`, ...) sum
  * doubles in partition order, so their low bits depend on partitioning —
  * they can never hash-match an oracle, and at 100 TB they are not even
  * run-to-run stable. The discipline here is the one the engine already
  * uses for entropy/surprisal (term-sorted folds): keep every AGGREGATE in
  * exact integer arithmetic (associative + commutative → identical under
  * any partitioning, any AQE re-plan, any executor count), and do the
  * floating-point arithmetic ONCE per output row from those exact sums.
  * Two engines evaluating the same IEEE expression over identical longs
  * produce identical doubles (only `ln`'s last ulp is libm-dependent,
  * which `round(_, 6)` absorbs — q113's log-odds precedent).
  *
  * Needed sums for a pair (x, y): n, Σx, Σy, Σxy, Σx², Σy² — six longs
  * per group, map-side combinable, one shuffle regardless of group count.
  * This is also the scale story: the sufficient statistics are O(groups),
  * not O(rows), and merging partial sums is exact — the same reason
  * count/sum scale and naive variance-of-doubles does not.
  *
  * Overflow envelope: Σx² ≤ n·max(x)²; callers bound max(x) (document
  * char/token counts ≤ ~10⁴) so even 10¹² rows stay inside int64 for the
  * moment sums; the n·Σx² products below are the binding term — callers
  * with n·max(x)² near 2⁶³ should pre-scale x.
  */
object IntStats {

  private def d(c: Column): Column = c.cast("double")

  /** Gini coefficient per group from non-negative integer values —
    * the concentration report ("what share of revenue sits in the top
    * tail?") as an EXACT rational: with values ranked ascending,
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx), emitted as
    * ⌊10⁶·G⌋. Ties rank arbitrarily but Σ i·xᵢ is tie-invariant
    * (swapping ranks between equal values changes nothing), so the
    * result is deterministic. One rank window + one integer
    * reduction per group; all-zero groups report 0.
    * `(group, n, total, gini_ppm)`. */
  def giniByGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    val base = df.select(group.as("grp"), value.cast("long").as("v"))
    val ranked = base.withColumn("i", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy("v")))
    // the rank-weighted sum reaches ~n²·max(v)/2 — ×10⁶ leaves Long
    // range long before real group sizes do, so the ratio is computed
    // in DECIMAL(38,0) (exact, 128-bit headroom; DuckDB's HUGEINT
    // mirrors it) and only the final ppm comes back as a Long
    ranked.groupBy("grp").agg(
        count(lit(1)).as("n"), sum("v").as("total"),
        sum(col("i").cast("decimal(38,0)") * col("v")).as("siv"))
      .select(col("grp").as("group"), col("n"), col("total"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) *
                  (2 * siv - (n + 1) * CAST(total AS DECIMAL(38,0))))
                div greatest(CAST(n AS DECIMAL(38,0)) *
                  CAST(total AS DECIMAL(38,0)), 1) AS BIGINT)""")
          .as("gini_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group — the
    * DISTRIBUTION-level drift test next to the moments-based monitor
    * ([[graft.llm.Drift]]): D = sup|ECDF₁ − ECDF₂| detects shape
    * changes (bimodality, tail shifts) that leave means and variances
    * untouched. Exact integer contract: with per-value side counts
    * c₁, c₂ and running sums r₁, r₂, the supremum of
    * |r₁/n₁ − r₂/n₂| is max|r₁·n₂ − r₂·n₁| / (n₁·n₂) — the numerator
    * an exact Long (r ≤ n ≤ 2³¹ keeps the product in range), the
    * ppm a floor division. One (group, value) count groupBy
    * (map-combinable — the window runs over the DISTINCT-value table,
    * never raw rows), one per-group ordered window (bounded partition:
    * the group domain — the [[giniByGroup]] discipline), one max
    * reduction. Groups missing either side are dropped (D undefined).
    * `(group, n1, n2, d_num, d_ppm)`. */
  def ksByGroup(df: DataFrame, group: Column, side: Column,
                value: Column): DataFrame = {
    val base = df.select(group.as("grp"), side.cast("boolean").as("s"),
      value.cast("long").as("v"))
    val counts = base.groupBy("grp", "v").agg(
      sum(when(col("s"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("s"), 1L).otherwise(0L)).as("c2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val totals = counts.groupBy("grp")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
      .where(col("n1") > 0 && col("n2") > 0)
    counts
      .withColumn("r1", sum("c1").over(w))
      .withColumn("r2", sum("c2").over(w))
      .join(broadcast(totals), "grp")
      .withColumn("d", abs(col("r1") * col("n2") - col("r2") * col("n1")))
      .groupBy(col("grp").as("group"), col("n1"), col("n2"))
      .agg(max("d").as("d_num"))
      // ppm step in DECIMAL(38,0): d_num can reach n1·n2, so the naive
      // `1000000L * d_num` Long multiply wraps once n1·n2 > ~9.2e12 —
      // two ~3M-row sides, far below the 2³¹ per-side bound that keeps
      // d_num itself exact. The decimal grid never wraps (38 digits ≥
      // 6 + 2·19 needed), and the result ≤ 1e6 casts back to BIGINT
      // losslessly — the q222 chi-square discipline.
      .withColumn("d_ppm",
        expr("""CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000
               |  div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"""
          .stripMargin))
  }

  /** α-trimmed mean per group over integer values: drop the
    * ⌊n·αPct/100⌋ smallest and largest values (as multisets —
    * tie-rank order cannot change which VALUES are dropped), report
    * the exact kept-sum ratio. The robust location estimate whose
    * breakdown point the plain mean lacks; the aggregation sibling of
    * [[graft.operators.Trend.madOutliers]]'s flags.
    * `(group, n, n_trim, sum_kept, mean_ppm)`. */
  def trimmedMeanByGroup(df: DataFrame, group: Column, value: Column,
                         alphaPct: Int = 10): DataFrame = {
    require(alphaPct >= 0 && alphaPct < 50, s"alphaPct: $alphaPct")
    val base = df.select(group.as("grp"), value.cast("long").as("v"))
    val ranked = base
      .withColumn("i", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy("v")))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")))
      .withColumn("k", expr(s"(n * ${alphaPct}L) div 100L"))
    ranked.filter(col("i") > col("k") && col("i") <= col("n") - col("k"))
      .groupBy(col("grp"), col("n"), col("k"))
      .agg(count(lit(1)).as("n_kept"), sum("v").as("sum_kept"))
      .select(col("grp").as("group"), col("n"), col("k").as("n_trim"),
        col("sum_kept"),
        expr("(1000000L * sum_kept) div greatest(n_kept, 1L)")
          .as("mean_ppm"))
  }

  /** Pearson r from integer moment sums; NULL when either variance is 0.
    * Mirrors exactly:
    * `round(CAST(n*sxy - sx*sy AS DOUBLE) /
    *    sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6)`
    */
  def corrFromSums(n: Column, sx: Column, sy: Column, sxy: Column,
                   sxx: Column, syy: Column): Column = {
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    when(vx === 0 || vy === 0, lit(null).cast("double"))
      .otherwise(round(d(cov) / sqrt(d(vx) * d(vy)), 6))
  }

  /** OLS slope of y ~ x (unrounded — intercept needs the full value). */
  def slopeFromSums(n: Column, sx: Column, sy: Column, sxy: Column,
                    sxx: Column): Column = {
    val vx = n * sxx - sx * sx
    when(vx === 0, lit(null).cast("double"))
      .otherwise(d(n * sxy - sx * sy) / d(vx))
  }

  /** OLS intercept: (Σy − slope·Σx)/n with the UNROUNDED slope. */
  def interceptFromSums(n: Column, sx: Column, sy: Column, sxy: Column,
                        sxx: Column): Column =
    (d(sy) - slopeFromSums(n, sx, sy, sxy, sxx) * d(sx)) / d(n)

  /** R² = cov² / (varx·vary) from the same sums; NULL on zero variance. */
  def r2FromSums(n: Column, sx: Column, sy: Column, sxy: Column,
                 sxx: Column, syy: Column): Column = {
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    when(vx === 0 || vy === 0, lit(null).cast("double"))
      .otherwise(round(d(cov) * d(cov) / (d(vx) * d(vy)), 6))
  }

  /** z-score of x against its group's (n, Σx, Σx²), sample (n−1) variance:
    * ((n·x − Σx)/n) / sqrt((n·Σx² − Σx²ₛ)/(n·(n−1))); NULL when n < 2 or
    * the group is constant.
    */
  def zscoreFromSums(x: Column, n: Column, sx: Column, sxx: Column): Column = {
    val vx = n * sxx - sx * sx
    when(n < 2 || vx === 0, lit(null).cast("double"))
      .otherwise(round((d(n * x - sx) / d(n)) /
        sqrt(d(vx) / d(n * (n - 1))), 6))
  }

  /** Pointwise mutual information ln(cnt·n / (cx·cy)) from joint and
    * marginal counts — exact-integer ratio, one ln per output row. */
  def pmiFromCounts(cnt: Column, cx: Column, cy: Column, n: Column): Column =
    round(log(d(cnt) * d(n) / (d(cx) * d(cy))), 6)

  /** Weighted median by VALUE-DOMAIN BISECTION — the 100 TB arm of
    * q156's per-group cumulative-weight window. The window formulation
    * totally sorts each group inside one task (a 5-language corpus has
    * a 5-task parallelism ceiling); this one runs ~log2(value range)
    * rounds, each a single MAP-COMBINABLE aggregate over the full
    * frame (`sum(w · [x ≤ mid])` per key — no sort, no window, no
    * per-group state), with an O(keys) driver-side bounds table (the
    * bounded-collect family: centroids, vocab, heavy hitters).
    *
    * And it is EXACT, not approximate: the invariant maintains the
    * smallest integer t with 2·W(≤t) ≥ W_total, and that t is always a
    * data value (if t-1 fails the inequality, weight entered at t). So
    * q156 can hash-gate this arm against the window formulation
    * outright — sharper than a bounds gate.
    *
    * Keys are strings; values `x` any Long range (floorDiv keeps the
    * bisection correct on negative domains); weights non-negative
    * Longs. Returns (k, total_w, weighted_median); keys with no rows
    * are absent, all-zero-weight keys return their min x (the window
    * formulation's own contract). */
  def weightedMedianBisect(df: DataFrame, key: Column, x: Column,
                           w: Column): DataFrame =
    weightedQuantileBisect(df, key, x, w, 1L, 2L)
      .withColumnRenamed("weighted_q", "weighted_median")

  /** General weighted quantile by the same bisection: smallest x with
    * W(≤x) ≥ (numer/denom)·W_total — the comparison stays in exact
    * integers (`denom·cw ≥ numer·tw`), so any rational quantile (p90 =
    * 9/10, p99 = 99/100) gets the identical log-round scale shape and
    * the identical hash-gateability. Returns (k, total_w, weighted_q). */
  def weightedQuantileBisect(df: DataFrame, key: Column, x: Column,
                             w: Column, numer: Long, denom: Long): DataFrame =
    weightedQuantilesBisect(df, key, x, w, Seq((numer, denom)))
      .select(col("k"), col("total_w"),
        element_at(col("weighted_qs"), 1).as("weighted_q"))

  /** Probes per open bracket per round: each round partitions an open
    * [lo, hi] into ≤ Fanout cells, so the round count is
    * ~log_Fanout(value range) instead of log2 — at 100 TB that is 3×
    * fewer SCANS for the same total compute (Fanout-1 predicates ride
    * one scan), and locally 3× fewer driver round-trips. */
  val BisectFanout = 8

  /** SEVERAL rational quantiles in ONE shared multi-way search loop:
    * each round evaluates every still-open (key, quantile) bracket's
    * probe set in the same map-combinable aggregate (rows fan out only
    * to the OPEN probe list — a bounded broadcast dimension join, not a
    * data reshuffle), so the round count is the max over quantiles
    * instead of their sum, and each bracket shrinks ~[[BisectFanout]]×
    * per round. Returns (k, total_w, weighted_qs) with the quantile
    * values in `qs` order.
    *
    * `unitWeightApproxSeed` callers assert w ≡ 1 AND non-null x for
    * every row: percentile_approx skips null x while sum(w) counts the
    * row, so null x rows would shift the sketch's ranks off the exact
    * loop's (the runtime endpoint guard below catches such a drift and
    * falls back to the exact bracket, at the cost of extra rounds). */
  def weightedQuantilesBisect(df: DataFrame, key: Column, x: Column,
                              w: Column, qs: Seq[(Long, Long)],
                              unitWeightApproxSeed: Boolean = false): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (n, d) =>
      require(n >= 0 && d > 0 && n <= d, s"quantile must be in [0, 1]: $n/$d")
    }
    val spark = df.sparkSession
    import spark.implicits._
    // the loop drives one ACTION per round: without a persist every
    // round would re-evaluate the caller's upstream projection (q156's
    // is a full-corpus tokenization) — cache the three-column base and
    // release it before returning (the result below is driver-local, so
    // no caller ever observes the cached plan)
    val base = df.select(key.as("k"), x.cast("long").as("x"),
      w.cast("long").as("w")).persist()
    try {
      // APPROX-SEEDED BRACKETS (unit weights only — the caller asserts
      // w ≡ 1): a [min, max] seed costs ~log_Fanout(value range) exact
      // rounds — ~9 driver round-trips on a cents-scale domain, and the
      // round count was the WHOLE cost of q220/q175. Greenwald–Khanna
      // (Spark's percentile_approx) carries a HARD rank-error bound
      // ε = 1/accuracy, so the values at ranks (q−2ε)·n and (q+2ε)·n
      // PROVABLY bracket the exact answer (the returned value's true
      // rank is within ε·n of the asked rank; the target rank sits ≥ε·n
      // inside both margins), and the exact integer bisection still
      // DECIDES the answer — the seed narrows the search, it never
      // defines the result, so the hash-gated value is bit-identical.
      // One extra aggregate on the same seed scan buys brackets ~4ε·n
      // ranks wide: 1-2 exact rounds instead of ~9.
      val eps = 1e-4
      val acc = (1 / eps).toInt
      val seedAgg =
        if (!unitWeightApproxSeed)
          base.groupBy("k")
            .agg(min("x").as("lo"), max("x").as("hi"), sum("w").as("tw"))
        else {
          val ps = qs.flatMap { case (n, d) =>
            val q = n.toDouble / d
            Seq(math.max(0.0, q - 2 * eps), math.min(1.0, q + 2 * eps))
          }
          base.groupBy("k")
            .agg(min("x").as("lo"), max("x").as("hi"), sum("w").as("tw"),
              percentile_approx(col("x"),
                array(ps.map(lit): _*), lit(acc)).as("brackets"))
        }
      val seedRows = seedAgg.collect()
      // per-(key, quantile) approx brackets, clamped into [min, max]
      val approxBr: Map[(String, Int), (Long, Long)] =
        if (!unitWeightApproxSeed) Map.empty
        else seedRows.flatMap { r =>
          val k = r.getString(0)
          val br = r.getSeq[Long](4)
          qs.indices.map(qi => (k, qi) -> ((br(2 * qi), br(2 * qi + 1))))
        }.toMap
      val seed = seedRows.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // Domain guards, ONCE per key (not per row), failing loudly instead
      // of silently wrapping: `hi - lo` overflows when a key's value
      // domain spans more than Long.MaxValue (values near both Long
      // extremes), which would degenerate probing to one value per round;
      // and the integer quantile test `denom·cw ≥ numer·tw` wraps when
      // denom·tw exceeds Long range (cw ≤ tw and numer ≤ denom, so this
      // single product bounds every comparison the loop performs).
      val maxDenom = qs.map(_._2).max
      seed.foreach { case (k, lo, hi, tw) =>
        try Math.subtractExact(hi, lo) catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"weightedQuantilesBisect: key '$k' value span [$lo, $hi] " +
              "exceeds Long range; pre-scale or split the domain")
        }
        try Math.multiplyExact(maxDenom, tw) catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"weightedQuantilesBisect: key '$k' total weight $tw × " +
              s"denominator $maxDenom exceeds Long range; pre-scale weights")
        }
      }
      val exactBounds: Map[String, (Long, Long)] =
        seed.map { case (k, lo, hi, _) => k -> ((lo, hi)) }.toMap
      var bounds: Map[(String, Int), (Long, Long, Long)] =
        (for ((k, lo, hi, tw) <- seed; qi <- qs.indices) yield {
          val (blo, bhi) = approxBr.getOrElse((k, qi), (lo, hi))
          // clamp into the exact [min, max] — belt over the G-K proof
          (k, qi) -> ((math.max(lo, blo), math.min(hi, bhi), tw))
        }).toMap
      // RUNTIME BRACKET GUARD (round-14 verdict/advice): the G-K rank
      // bound proves the approx bracket contains the exact answer, but
      // the loop below only probes strictly below `hi` — with a
      // [min, max] seed ok(hi) is trivially true, with an approx seed a
      // rank-convention drift (Spark internals, or a caller whose null
      // x rows inflate tw past the sketch's row count) would make the
      // bisection silently converge inside a wrong bracket. Every
      // approx-seeded bracket therefore has its endpoints PROBED —
      // ok(hi) && (lo == min || !ok(lo-1)) — in the first round it
      // participates in, riding the same aggregate (zero extra rounds
      // while any bracket is open; one validation round when the seed
      // converged everything), and falls back to the exact [min, max]
      // bracket on violation instead of returning a wrong quantile.
      // .iterator first: collect on a Map with a pair-producing function
      // rebuilds a MAP and silently drops same-first-element brackets
      var unvalidated: Set[(String, Int)] =
        if (!unitWeightApproxSeed) Set.empty
        else bounds.iterator.collect { case (kq @ (k, _), (lo, hi, _))
          if (lo, hi) != exactBounds(k) => kq }.toSet
      // probes in [lo, hi): evenly spaced on a floorDiv step (hi − lo
      // checked non-overflowing above; step 0 degenerates to the single
      // probe `lo`, i.e. plain bisection on 1-wide brackets)
      def probesOf(lo: Long, hi: Long): Seq[Long] = {
        val step = Math.floorDiv(hi - lo, BisectFanout.toLong)
        (1 until BisectFanout).map(i => lo + step * i)
          .filter(p => p >= lo && p < hi).distinct match {
          case Seq() => Seq(lo)
          case ps => ps
        }
      }
      while (bounds.values.exists { case (lo, hi, _) => lo < hi } ||
          unvalidated.nonEmpty) {
        val probes = bounds.toSeq.flatMap { case ((k, qi), (lo, hi, _)) =>
          val open = if (lo < hi) probesOf(lo, hi) else Seq.empty[Long]
          val guard =
            if (unvalidated((k, qi)))
              hi +: (if (lo > exactBounds(k)._1) Seq(lo - 1L) else Nil)
            else Nil
          (open ++ guard).distinct.map(p => (k, qi, p))
        }.toDF("k", "qi", "p")
        val cum = base.join(broadcast(probes), "k")
          .groupBy("k", "qi", "p")
          .agg(sum(when(col("x") <= col("p"), col("w")).otherwise(0L)).as("cw"))
          .as[(String, Int, Long, Long)].collect()
          .map { case (k, qi, p, cw) => (k, qi, p) -> cw }.toMap
        bounds = bounds.map { case (kq @ (k, qi), (lo, hi, tw)) =>
          val (numer, denom) = qs(qi)
          def ok(p: Long): Boolean =
            denom * cum.getOrElse((k, qi, p), 0L) >= numer * tw
          val bracketViolated = unvalidated(kq) && {
            val exLo = exactBounds(k)._1
            !(ok(hi) && (lo == exLo || !ok(lo - 1)))
          }
          if (bracketViolated) {
            // the seed's bracket provably excludes the answer — widen to
            // the exact [min, max] and re-bisect (loud: this indicates a
            // rank-contract drift and should never fire)
            System.err.println(s"[IntStats] approx bracket [$lo, $hi] for " +
              s"key '$k' quantile ${qs(qi)._1}/${qs(qi)._2} violated the " +
              "endpoint probe; falling back to the exact [min, max] bracket")
            val (exLo, exHi) = exactBounds(k)
            kq -> ((exLo, exHi, tw))
          } else if (lo >= hi) kq -> ((lo, hi, tw))
          else {
            val ps = probesOf(lo, hi).sorted
            // the answer is the smallest x with ok(x); ok is monotone, hi
            // is always valid — clamp to the tightest cell the probes prove
            val hi2 = ps.find(ok).getOrElse(hi)
            val lo2 = ps.filter(p => p < hi2 && !ok(p)).lastOption
              .map(_ + 1L).getOrElse(lo)
            kq -> ((lo2, hi2, tw))
          }
        }
        unvalidated = Set.empty
      }
      bounds.toSeq.groupBy(_._1._1).toSeq.map { case (k, rows) =>
        val byQi = rows.map { case ((_, qi), (lo, _, _)) => qi -> lo }.toMap
        (k, rows.head._2._3, qs.indices.map(byQi).toSeq)
      }.toDF("k", "total_w", "weighted_qs")
    } finally base.unpersist()
  }
}
