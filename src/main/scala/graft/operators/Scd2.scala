package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build — the warehouse
  * operator that turns a change stream `(key, value, ts)` into validity
  * intervals `(key, value, valid_from, valid_to)`: one row per value
  * RUN, closed by the next run's start, the current run open (null
  * valid_to).
  *
  * Shape: one hash exchange by key and ONE sort serves both windows
  * (the change-detection lag and the interval-closing lead share the
  * same (key, ts, tie) order, so Spark plans a single sort). State is
  * O(1) per row; a key's history length never builds arrays. Ordering
  * ties break on `tie` (an event id), making the build deterministic
  * under any partitioning — same-timestamp duplicate values collapse
  * into the run, same-timestamp DIFFERENT values order by tie.
  */
object Scd2 {

  /** `(key, value, valid_from, valid_to)` — `valid_to` null on the
    * open (current) run. Consecutive equal values merge into one row.
    * Column names: key → "key", value → "value"; timestamps are
    * whatever numeric/timestamp type `ts` carries. */
  def intervals(changes: DataFrame, key: Column, value: Column,
                ts: Column, tie: Column): DataFrame = {
    val base = changes.select(key.as("key"), value.as("value"),
      ts.as("ts"), tie.as("tie"))
    // ONE window spec serves both the change-lag and the interval-lead
    // (identical partition + order ⇒ Spark plans a single sort)
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
    val flagged = base
      .withColumn("_prev", lag(col("value"), 1).over(w))
      // `_first` distinguishes "no previous row" from "previous value
      // was null" — with only the null-safe value compare, a key whose
      // FIRST value is null would have its leading run silently dropped
      // (null <=> null is true)
      .withColumn("_first", lag(lit(1), 1).over(w).isNull)
      // a run starts at the key's first row, or where the value differs
      // from the previous row (null-safe: null -> null is "no change")
      .where(col("_first") || !(col("value") <=> col("_prev")))
    flagged
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select("key", "value", "valid_from", "valid_to")
  }
}
