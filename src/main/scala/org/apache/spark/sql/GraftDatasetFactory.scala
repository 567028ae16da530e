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
}
