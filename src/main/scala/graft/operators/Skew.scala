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

  /** HEAVY/LIGHT-decomposed inner equi-join — the complementary skew
    * strategy to [[saltedJoin]] for when the small side is too big to
    * broadcast WHOLE but the hot keys are few (the real 100 TB shape:
    * a bot visitor id, a null-ish sentinel key, one viral item): probe
    * the large side for its heaviest keys (one map-combinable count +
    * a bounded top-`topN` collect — the heavy-hitter probe q150
    * reports on), then route those keys through a BROADCAST join
    * (only the small side's heavy-key SUBSET broadcasts — topN rows
    * per key, not the table) while every other key takes the normal
    * shuffle join; union. The hot keys therefore never meet a single
    * reducer, and the result equals the plain inner join BY
    * CONSTRUCTION — the key space is partitioned exactly (q164
    * hash-gates the equality; inner-join semantics drop null keys on
    * both routes alike). `minCount` keeps the probe honest: keys below
    * it are never worth the broadcast detour, so a uniform table
    * degenerates to one plain shuffle join plus an empty broadcast
    * branch. */
  def splitJoin(large: DataFrame, small: DataFrame, key: String,
                topN: Int = 8, minCount: Long = 2L): DataFrame = {
    require(topN >= 1, s"topN must be positive: $topN")
    val heavy = large.groupBy(col(key)).agg(count(lit(1)).as("_c"))
      .where(col("_c") >= minCount && col(key).isNotNull)
      .orderBy(col("_c").desc, col(key))
      .limit(topN)
      .select(col(key)).collect().map(_.get(0)).toSeq
    if (heavy.isEmpty) return large.join(small, Seq(key))
    val heavyPath = large.filter(col(key).isin(heavy: _*))
      .join(broadcast(small.filter(col(key).isin(heavy: _*))), Seq(key))
    val lightPath = large.filter(!col(key).isin(heavy: _*))
      .join(small.filter(!col(key).isin(heavy: _*)), Seq(key))
    heavyPath.unionByName(lightPath)
  }
}
