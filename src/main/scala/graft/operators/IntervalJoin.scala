package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-interval self-join: all pairs of rows with the same key whose
  * timestamps lie within `windowMs` of each other — the two-sided
  * complement of [[AsOfJoin]] (latest-before) and the batch semantics of
  * a stream-stream join's time bound. Co-visitation, burst detection,
  * near-simultaneous-event correlation all reduce to it.
  *
  * Scale shape: NEVER a raw range predicate after a key-only equi-join
  * (a hot key goes quadratic in one task). Timestamps are bucketed by
  * the window size; |tsA − tsB| ≤ W implies the bucket delta is in
  * {-1, 0, 1}, so the left side probes three bucket keys and the join is
  * a plain equi-join on (key, bucket) — each true pair is produced
  * exactly once (at the RIGHT row's bucket) — followed by the exact
  * window filter. A hot key's cost is bounded per (key, bucket) cell,
  * i.e. by its rate, not its total volume.
  */
object IntervalJoin {

  /** Pairs (a, b) with `a_id < b_id`, same `key`, |tsA − tsB| ≤
    * `windowMs`. Output: key, a_id, b_id, ts_a, ts_b, gap_ms ≥ 0 is not
    * guaranteed — gap is ts_b − ts_a (may be negative when b precedes
    * a in time but follows it in id order). */
  def selfJoinWithin(df: DataFrame, key: Column, id: Column, tsMs: Column,
                     windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    val base = df.select(key.as("key"), id.as("id"), tsMs.as("ts"),
      floor(tsMs / windowMs).cast("long").as("b"))
    val probes = base.select(col("key"), col("id"), col("ts"),
      explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b"))
    val l = probes.toDF("key", "a_id", "ts_a", "b")
    val r = base.toDF("key", "b_id", "ts_b", "b")
    l.join(r, Seq("key", "b"))
      .where(col("a_id") < col("b_id") &&
        abs(col("ts_a") - col("ts_b")) <= windowMs)
      .select(col("key"), col("a_id"), col("b_id"),
        col("ts_a"), col("ts_b"), (col("ts_b") - col("ts_a")).as("gap_ms"))
  }
}
