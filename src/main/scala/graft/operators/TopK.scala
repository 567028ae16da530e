package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped top-k as an AGGREGATE instead of a window.
  *
  * `row_number().over(partitionBy(key).orderBy(ord))` ships every row of
  * a group to ONE task and sorts it — a hot key (bot visitor, null-key
  * flood) becomes a straggler sorting 10^8 rows to keep 3. The aggregate
  * form keeps a bounded heap of k rows per group: O(k) state, partial
  * aggregation combines heaps map-side, and a hot key costs each task
  * only its local k. This is Spark's own `CollectTopK` (the pandas-layer
  * nlargest machinery), SQL-exposed via [[graft.GraftExtensions]].
  *
  * Ordering is the `ord` struct's lexicographic field order — put the
  * rank column first and a unique tie-breaker second, or ties make the
  * kept set nondeterministic. Oracle-gated (q69) against the equivalent
  * window formulation in DuckDB.
  */
object TopK {

  /** One row per (group key(s), rank 1..k): `ord` struct exploded back
    * to columns plus a `rank` column. `largest=true` ranks descending. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], ord: Column, k: Int,
                 largest: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.groupBy(keys: _*)
      .agg(call_function("collect_top_k", ord, lit(k), lit(!largest)).as("_top"))
      .select((keys :+ posexplode(col("_top")).as(Seq("_pos", "_row"))): _*)
      .withColumn("rank", (col("_pos") + 1).cast("long"))
      .drop("_pos")
  }
}
