package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * primitive): a constraint suite evaluated against a table, producing a
  * machine-readable report — the admission gate a training pipeline
  * runs before a new data drop enters the corpus (and the counterpart
  * of the reference's schema-padding discipline: assert the contract,
  * don't silently coerce).
  *
  * Scale shape: every scan constraint (null, range, set membership,
  * row count) folds into ONE map-combinable aggregation pass — adding a
  * constraint adds a conditional-sum column, not a scan. Each
  * uniqueness constraint is its own two-level aggregate (a
  * count_distinct in the shared pass would re-Expand the scan per
  * distinct — the q62 lesson), so `k` unique checks cost `k`
  * map-combinable key shuffles, never k scans of a cached frame: the
  * one-row metric frame is eagerly checkpointed and every report row
  * projects from it.
  *
  * Null semantics, fixed and documented: a null value VIOLATES
  * `InRange`/`InSet` (null is not in any range or set) and `NotNull`;
  * `Unique` treats null as a key like any other (two null keys are
  * duplicates).
  */
object Expectations {

  sealed trait Expectation
  /** Column must contain no nulls. */
  final case class NotNull(column: String) extends Expectation
  /** Column values (nulls included) must occur at most once. */
  final case class Unique(column: String) extends Expectation
  /** lo <= value <= hi for every row; null violates. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Expectation
  /** Value must be one of `values`; null violates. */
  final case class InSet(column: String, values: Seq[String]) extends Expectation
  /** Table must hold at least `n` rows. */
  final case class MinRows(n: Long) extends Expectation

  /** Report: (rule, col, observed, passed) — one row per expectation.
    * `observed` is the violation count (scan rules), the duplicated-key
    * count (`Unique`), or the row count (`MinRows`). */
  def check(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "no expectations given")
    val scanRules = exps.collect {
      case e @ NotNull(c) =>
        (s"not_null", c, sum(when(col(c).isNull, 1L).otherwise(0L)))
      case e @ InRange(c, lo, hi) =>
        (s"in_range($lo,$hi)", c,
          sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L)))
      case e @ InSet(c, vs) =>
        (s"in_set", c,
          sum(when(col(c).isNull || !col(c).isin(vs: _*), 1L).otherwise(0L)))
    }
    val aggCols = count(lit(1)).cast("double").as("_total") +:
      scanRules.zipWithIndex.map { case ((_, _, m), i) =>
        m.cast("double").as(s"_m$i")
      }
    // one pass, one row; checkpointed so the per-rule projections below
    // read it instead of re-running the scan per report row
    val metrics = df.agg(aggCols.head, aggCols.tail: _*).localCheckpoint(true)
    val scanReport = scanRules.zipWithIndex.map { case ((rule, c, _), i) =>
      metrics.select(lit(rule).as("rule"), lit(c).as("col"),
        col(s"_m$i").as("observed"), (col(s"_m$i") === 0.0).as("passed"))
    }
    val countReport = exps.collect { case MinRows(n) =>
      metrics.select(lit("min_rows").as("rule"), lit("").as("col"),
        col("_total").as("observed"), (col("_total") >= n.toDouble).as("passed"))
    }
    val uniqueReport = exps.collect { case Unique(c) =>
      df.groupBy(col(c)).agg(count(lit(1)).as("_n"))
        .where(col("_n") > 1L)
        .agg(count(lit(1)).cast("double").as("_d"))
        .select(lit("unique").as("rule"), lit(c).as("col"),
          col("_d").as("observed"), (col("_d") === 0.0).as("passed"))
    }
    (scanReport ++ countReport ++ uniqueReport).reduce(_.unionByName(_))
  }
}
