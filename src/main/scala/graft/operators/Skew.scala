package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives — the manual counterpart to AQE's runtime
  * skew-join splitting (which GraftSession enables). Use these when the
  * skew is KNOWN ahead of time (bot traffic on one visitor id, a null-key
  * flood) and you want a deterministic plan rather than a runtime rescue:
  *
  *  - [[saltedAggregate]]: two-phase aggregation — shuffle once on
  *    (key, salt) so one hot key spreads over `buckets` reducers, then
  *    combine the per-salt partials. Works for any algebraic aggregate.
  *  - [[saltedJoin]]: replicate the SMALL side `buckets` times (one copy
  *    per salt value) and salt the large side's key, so a hot join key's
  *    rows land on `buckets` different partitions.
  *
  * The salt is derived by hashing a row-unique column (deterministic;
  * `rand()` would break retries and oracle reproducibility).
  */
object Skew {

  def salt(saltBy: Column, buckets: Int): Column =
    pmod(hash(saltBy), lit(buckets))

  /** Two-phase salted sum/count per key. `partials` maps output column
    * name → column to sum. Returns one row per key with the exact same
    * totals as a direct groupBy. */
  def saltedAggregate(df: DataFrame, key: Column, saltBy: Column, buckets: Int,
                      partials: Map[String, Column]): DataFrame = {
    val phase1 = df
      .withColumn("_salt", salt(saltBy, buckets))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(count(lit(1)).as("_cnt"),
        partials.map { case (n, c) => sum(c).as(n) }.toSeq: _*)
    phase1.groupBy(col("_key"))
      .agg(sum(col("_cnt")).as("n_rows"),
        partials.keys.map(n => sum(col(n)).as(n)).toSeq: _*)
      .withColumnRenamed("_key", "key")
  }

  /** Salted equi-join: every row of `small` is replicated once per salt
    * bucket; `large` rows carry a deterministic salt — result equals the
    * plain inner join on `key`. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt", salt(saltBy, buckets))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
