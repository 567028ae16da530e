package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional layout key
  * behind data-skipping writes: sorting by `zValue(x, y)` clusters rows
  * so that BOTH dimensions are locally narrow in every file, and a scan
  * filtered on either column can prune by footer min/max stats instead
  * of reading everything. A plain `ORDER BY x` gives perfect pruning on
  * x and none on y; the z-curve gives ~sqrt pruning on each — the right
  * trade for a corpus queried by more than one column (date AND
  * domain, language AND source).
  *
  * The interleave is unrolled at plan-build time into `bits` pairs of
  * shift/mask/or terms — pure integer arithmetic, whole-stage codegen,
  * no UDF — and is mirrored literally by the DuckDB oracle (q95).
  * [[layoutBy]] is the write-side operator: range-partition by zvalue
  * (Spark samples the range bounds), sort within partitions, ready for
  * a parquet write where every file covers one z-range.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative longs:
    * result bit 2i is x's bit i, bit 2i+1 is y's bit i. */
  def zValue(x: Column, y: Column, bits: Int = 10): Column =
    zValueN(Seq(x, y), bits)

  /** N-ary Morton code (round-12 verdict #3 — the two-column
    * interleave was a hard-coded arity, but a table queried by three
    * dimensions wants a 3-way curve): result bit `i*n + j` is column
    * j's bit i, so every column contributes one bit per round and the
    * curve stays balanced at any arity. `bits * n` must fit a
    * non-negative long. A SINGLE column needs no interleave — the
    * identity (perfect 1-D clustering) is returned. */
  def zValueN(cols: Seq[Column], bits: Int = 10): Column = {
    val n = cols.length
    require(n >= 1, "zValueN needs at least one column")
    if (n == 1) return cols.head
    require(bits > 0 && bits * n <= 63,
      s"bits*columns must be in [1,63]: $bits*$n")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write-side layout: cluster `df` on the z-curve over (x, y). The
    * range exchange is one shuffle; the in-partition sort keeps every
    * output file's (x, y) min/max tight. */
  def layoutBy(df: DataFrame, x: Column, y: Column, bits: Int = 10,
               numPartitions: Int = 0): DataFrame =
    layoutByN(df, Seq(x, y), bits, numPartitions)

  /** [[layoutBy]] at any arity ≥ 1: one column = plain range-cluster
    * (ORDER BY layout), n columns = the n-ary Morton curve. */
  def layoutByN(df: DataFrame, cols: Seq[Column], bits: Int = 10,
                numPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains("_z"),
      "input must not contain the reserved column _z")
    val keyed = df.withColumn("_z", zValueN(cols, bits))
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("_z"))
      else keyed.repartitionByRange(col("_z"))
    parted.sortWithinPartitions(col("_z")).drop("_z")
  }
}
