package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` classic Dataset factory so graft's
  * custom logical operators (e.g. [[graft.plans.GreedyPackPlan]]) can be
  * wrapped back into a DataFrame — the standard pattern Spark-extension
  * libraries use for exactly this (a one-call accessor object declared
  * inside the `org.apache.spark.sql` package; no Spark internals are
  * modified). */
object GraftDatasetFactory {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ Expression bridges (`private[sql]` in classic) — lets
    * graft compose Spark's own internal-but-public expression classes
    * (e.g. BloomFilterAggregate, the sketch the runtime row-filter
    * ships) into DataFrame code without reimplementing them. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
