package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout — the shuffle-elimination technique for
  * joins repeated on the same key (fact-to-fact daily joins, the dedup
  * pair table against the corpus, history ∪ today merges): write both
  * sides bucketed by the join key once, and every subsequent equi-join
  * on that key is exchange-free — each task zips bucket i with bucket i.
  *
  * At 100 TB this converts the recurring cost (a full shuffle of both
  * tables per run) into a one-time layout cost at write. The bucket
  * count fixes downstream parallelism for the co-located stages — size
  * it to the target executor count, not the data (buckets are split
  * further by file within a bucket for scans, but not for joins).
  *
  * Spec-gated (PlanSpec: the bucketed join's physical plan contains no
  * Exchange), like the other sinks — a storage layout cannot be
  * oracle-checked, only its read-back equivalence and plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting), bucketed and
    * sorted by `key` into `buckets` files per partition. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket key — planned
    * without any Exchange when both sides were written with the same
    * bucket count on `key`. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
