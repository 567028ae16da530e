package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left AS-OF join — attach to every left row the latest right row with
  * `rightTs <= leftTs` for the same key (the time-series join Spark has
  * no built-in operator for; DuckDB/kdb call it ASOF JOIN).
  *
  * Composed from built-ins, per the engine's custom-operator preference
  * order (compose > custom plan): UNION both sides tagged with a side
  * marker, hash-shuffle ONCE by key, sort within the partition by
  * (ts, side) — right rows first at equal timestamps, so ties are
  * INCLUSIVE — and carry the right payload forward with
  * `last(_, ignoreNulls)` over the running window; keep the left rows.
  * No range crossJoin, no per-key collect: one exchange at any scale,
  * and AQE handles skewed keys like any other window.
  *
  * Determinism contract: right rows must be UNIQUE per (key, ts) —
  * aggregate the right side first (e.g. `groupBy(key, ts).agg(max(...))`)
  * or the carried payload at duplicate timestamps is order-dependent.
  * Payload column names must not collide with left columns.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(payload.forall(right.columns.contains),
      s"right side is missing payload columns: ${payload.filterNot(right.columns.contains).mkString(", ")}")
    require(!payload.exists(left.columns.contains),
      s"payload names collide with left columns: ${payload.filter(left.columns.contains).mkString(", ")}")
    // The scratch columns below would silently clobber same-named input
    // columns (withColumn/select replace by name) — wrong output, no error.
    val scratch = Seq("_pay", "_side")
    require(!scratch.exists(c => left.columns.contains(c) || right.columns.contains(c)),
      s"input columns collide with asofJoin scratch names: ${scratch.filter(c => left.columns.contains(c) || right.columns.contains(c)).mkString(", ")}")
    // The payload travels as ONE struct: `last(_, ignoreNulls)` then
    // skips rows, not fields — a NULL payload VALUE in the latest right
    // row is faithfully returned as null (a per-field last would fall
    // through to a staler row, and could stitch fields from different
    // right rows into one that never existed).
    val payStruct = struct(payload.map(col): _*)
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType, nullable = true)))
    val lNorm = left.select(
      left.columns.map(col) :+
        lit(null).cast(payType).as("_pay") :+
        lit(1).as("_side"): _*)
    // right rows with a NULL timestamp match nothing (SQL `l.ts >= NULL`
    // is never true); without the filter they'd sort nulls-first and
    // match EVERY left row of the key
    val rNorm = right.where(col(ts).isNotNull).select(
      left.columns.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        payStruct.as("_pay") :+
        lit(0).as("_side"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lNorm.unionByName(rNorm)
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    joined.select(
      left.columns.map(col) ++
        payload.map(p => col("_pay").getField(p).as(p)): _*)
  }
}
