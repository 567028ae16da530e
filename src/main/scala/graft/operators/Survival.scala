package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier '58) — the
  * right-censoring-aware answer to "how long do sessions/users/
  * subscriptions last?": naive averages of observed durations are
  * biased low because still-running spells are cut off by the
  * observation window; KM multiplies per-time conditional survival
  * (1 − d_t/n_t) so censored spells contribute risk exposure up to
  * their cut without pretending they ended there.
  *
  * Determinism (the q176/q191 integer discipline): the curve lives on
  * a 10⁶ grid folded STEP BY STEP with positive integral division —
  * s ← ⌊s·(n_t − d_t)/n_t⌋ — so the whole table replays bit-for-bit
  * in SQL (a linear recursive CTE). Censored-only times keep s exactly
  * (s·n/n floors to s).
  *
  * Scale shape: the corpus-sized work is ONE integer groupBy from
  * observations to the per-duration (d_t, c_t) table; that table is
  * DURATION-DOMAIN-bounded (one row per distinct duration — minutes,
  * days), collected under the same bounded-by-contract rule as the
  * Markov chain / k-means centroids and folded in exact Longs on the
  * driver. Observation volume is touched exactly once.
  */
object Survival {

  /** The KM life table: `(t, n_risk, n_event, n_censored, s_ppm)`,
    * one row per distinct duration present, ascending `t` semantics
    * (rows are set-compared; `s_ppm` is the survival AFTER processing
    * time t). `isEvent` true = the spell truly ended at `duration`;
    * false = right-censored there. */
  def kaplanMeier(obs: DataFrame, duration: Column,
                  isEvent: Column): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val grouped = obs
      .select(duration.cast("long").as("t"), isEvent.as("e"))
      .groupBy("t")
      .agg(count(when(col("e"), 1)).as("d"),
        count(when(!col("e"), 1)).as("c"))
    // duration-domain-bounded collect: one row per distinct duration
    val rows = grouped.as[(Long, Long, Long)].collect().sortBy(_._1)
    var n = rows.iterator.map(r => r._2 + r._3).sum
    var s = 1000000L
    val out = rows.map { case (t, d, c) =>
      if (n > 0) s = s * (n - d) / n
      val row = (t, n, d, c, s)
      n -= d + c
      row
    }
    out.toSeq.toDF("t", "n_risk", "n_event", "n_censored", "s_ppm")
  }
}
