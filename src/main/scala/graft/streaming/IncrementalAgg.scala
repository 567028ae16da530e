package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE over the change feed: keep a keyed
  * aggregate mirror (count + integral sums) in sync with a manifest
  * table by folding each CDC batch into O(distinct keys in the batch)
  * deltas — never rescanning the base. Exactness is the group-
  * homomorphism argument additive aggregates satisfy: per key,
  * agg(base − deleted + inserted) = agg(base) − agg(deleted) +
  * agg(inserted), so applying signed deltas (insert = +1, delete = −1)
  * to the mirror reproduces the full recompute bit-for-bit for counts
  * and integral sums. Non-additive aggregates (min/max after deletes,
  * distinct counts) do NOT fold this way — that is exactly why this
  * helper only offers count + sum; for those, recompute or keep the
  * full key-level mirror (q235's row mirror) instead.
  *
  * Scale shape per batch: one map-side-combined aggregation of the
  * batch (O(batch) rows in, O(batch keys) out) and one key equi-join
  * against the mirror — at 100 TB the mirror is O(keys), the batch is
  * O(commit), and the base table is never read. Keys must be non-null
  * (an equi-join cannot match null keys; normalize upstream).
  *
  * Composes with [[ManifestStreamProvider]]'s `changeFeed=true`: an
  * erasure's replacement commit arrives as delete(old rows) +
  * insert(survivors), and the net delta per key is exactly the erased
  * rows' contribution — the aggregate forgets the subject without
  * anyone recomputing it.
  */
object IncrementalAgg {

  /** Fold one CDC batch (`_change_type` ∈ insert|delete, data columns
    * include `keys` and the summed columns) into `mirror`
    * (schema: keys, n_rows, sum_<c>…). Returns the new mirror; keys
    * whose row count reaches zero drop out entirely. */
  def applyDelta(mirror: DataFrame, batch: DataFrame, keys: Seq[String],
                 sums: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "incremental aggregate needs key columns")
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val aggCols = sum(sign).as("d__n") +:
      sums.map(c => sum(sign * col(c)).as(s"d__$c"))
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    mirror.join(delta, keys, "full_outer")
      .select(keys.map(col) ++
        Seq((coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d__n"), lit(0L))).as("n_rows")) ++
        sums.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"d__$c"), lit(0L))).as(s"sum_$c")): _*)
      .where(col("n_rows") > 0)
  }

  /** The mirror a fresh stream starts from: zero keys. */
  def emptyMirror(spark: org.apache.spark.sql.SparkSession,
                  batchSchema: org.apache.spark.sql.types.StructType,
                  keys: Seq[String], sums: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = keys.map(k => batchSchema(k)) ++
      (StructField("n_rows", LongType) +:
        sums.map(c => StructField(s"sum_$c", LongType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
  }
}
