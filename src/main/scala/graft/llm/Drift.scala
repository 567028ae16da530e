package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary drift between two corpus slices — the monitoring
  * counterpart of [[TextOps.vocabStats]]: which terms moved between
  * yesterday's corpus and today's (or between two sources, two
  * languages, two pipeline versions)? The standard smoothed log-odds
  * score; large |lor| = the term's frequency share shifted.
  *
  * lor(t) = ln( ((cA+0.5)·(NB+1)) / ((cB+0.5)·(NA+1)) ) — one ln call
  * over exact integer-derived doubles, so the DuckDB oracle reproduces
  * the value bit-for-bit with the same expression tree (no fold-order
  * caveat: each term's score is a single expression).
  *
  * Scale shape: each side is one map-combinable token count; the
  * full-outer join runs term-keyed (vocab-sized, not corpus-sized);
  * corpus totals are 1-row broadcasts. `minCount` drops noise terms
  * whose odds are all smoothing.
  */
object Drift {

  /** `(term, cnt_a, cnt_b, lor)` for terms with cnt_a + cnt_b >=
    * minCount, lor rounded to 6. */
  def logOddsDrift(a: DataFrame, b: DataFrame, text: Column,
                   minCount: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be positive: $minCount")
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(explode(TextOps.lowerTokens(text)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as(out))
    val ca = counts(a, "cnt_a")
    val cb = counts(b, "cnt_b")
    val na = ca.agg(sum(col("cnt_a")).as("n_a")) // 1 row, broadcasts
    val nb = cb.agg(sum(col("cnt_b")).as("n_b"))
    ca.join(cb, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .where(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        round(log(
          ((col("cnt_a").cast("double") + 0.5) *
            (col("n_b").cast("double") + 1.0)) /
          ((col("cnt_b").cast("double") + 0.5) *
            (col("n_a").cast("double") + 1.0))), 6).as("lor"))
  }
}
