package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the held-out-set primitive of a
  * training-data pipeline. The split is a pure function of the id (a
  * 60-bit md5 prefix mod `buckets`), so it is:
  *
  *  - stable across runs, partitionings and cluster sizes (no RNG, no
  *    `rand()` whose per-partition seeds reshuffle under AQE);
  *  - consistent across TABLES: any row keyed by the same id lands in
  *    the same split, so features/labels/metadata never leak across the
  *    train/validation boundary;
  *  - mirrorable by any engine with md5 (the DuckDB oracle reproduces
  *    the exact assignment).
  */
object Splits {

  val Buckets = 100

  /** The engine's ONE hash-to-long: value of the first 15 md5 hex digits
    * (top 60 bits of the digest). Every deterministic-hash operator
    * (splits, sampling, line dedup, the decontamination HOF) derives
    * from this so all of them stay bit-identical to the DuckDB oracle's
    * `('0x'||substr(md5(x),1,15))::BIGINT` mirror. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Bucket in [0, buckets) from the id's md5. */
  def md5Bucket(id: Column, buckets: Int = Buckets): Column =
    md5Long(id.cast("string")) % buckets

  /** 'train' / 'val' / 'test' assignment with integer percentage
    * weights (train + val <= 100; the remainder is test). */
  def split(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= Buckets,
      s"invalid split weights: $trainPct/$valPct")
    val b = md5Bucket(id)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic weighted reservoir sampling (Efraimidis–Spirakis
    * A-ES), the "pick k representative docs per stratum, long docs more
    * likely" primitive. Each row draws a pseudo-uniform u from its
    * salted id's md5 (top 60 digest bits, +0.5 so u is never 0), and
    * ranks on ln(u)/w — the monotone-equivalent log form of the A-ES
    * key u^(1/w), numerically tamer and mirrorable (ln, not pow).
    * Largest key wins, so P(row in sample) ∝ its weight, exactly as a
    * weighted reservoir would draw — but with NO RNG: the sample is a
    * pure function of (id, salt), stable across runs, partitionings and
    * AQE re-plans, and reproducible by the DuckDB oracle.
    *
    * Scale shape: the key is a map-side projection; the per-stratum
    * top-k is the bounded-heap aggregate ([[graft.operators.TopK]]) —
    * O(k) state per group, partials combine map-side, a hot stratum
    * costs each task only its local k. One shuffle on the stratum key.
    *
    * `weight` must be strictly positive; ties (same key — only possible
    * from identical (id, salt), i.e. never within a table with unique
    * ids) break on the id's binary order. Returns one row per (stratum,
    * rank 1..k): stratum column(s), `id`, `weight`, `rank`. */
  def weightedSample(df: org.apache.spark.sql.DataFrame,
                     strata: Seq[Column], id: Column, weight: Column,
                     k: Int, salt: String = "wrs")
                    : org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val twoTo60 = 1152921504606846976.0 // 2^60, exact as a double
    val keyed = df.select(
      (strata :+ id.as("_id") :+ weight.cast("double").as("_w")): _*)
      // the positivity contract is enforced per ROW, not just
      // documented: a w <= 0 would silently invert the sample
      // (ln(u)/w flips sign and outranks every valid row). assert_true
      // feeds the kept column via coalesce so the optimizer can't
      // prune the check away.
      .withColumn("_w", coalesce(
        assert_true(col("_w") > 0.0,
          lit("weightedSample: weight must be strictly positive"))
          .cast("double"),
        col("_w")))
      .withColumn("_u",
        (md5Long(concat(col("_id").cast("string"), lit(salt)))
          .cast("double") + 0.5) / twoTo60)
      .withColumn("_key", log(col("_u")) / col("_w"))
    graft.operators.TopK.topKPerKey(keyed, strata,
        struct(col("_key"), col("_id"), col("_w")), k)
      .select((strata ++ Seq(col("_row._id").as("id"),
        col("_row._w").as("weight"), col("rank"))): _*)
  }

  /** Deterministic Bernoulli sample predicate: keep a row iff its salted
    * id's per-mille md5 bucket falls below `perMille` (0..1000). The
    * corpus-downsampling primitive (e.g. cap an over-represented stratum
    * at 10% by passing a per-row `perMille` expression), with the same
    * guarantees as [[split]]: no RNG — stable across runs, partitionings
    * and AQE re-plans (unlike `sample()`/`rand()`, whose per-partition
    * seeds reshuffle), consistent across tables keyed by the same id, and
    * exactly mirrorable by the DuckDB oracle. Distinct `salt` values give
    * independent samples; the same salt gives nested ones (a 100‰ sample
    * is a subset of the 500‰ sample). Map-side predicate: no shuffle. */
  def hashSample(id: Column, perMille: Column, salt: String = ""): Column =
    md5Bucket(concat(id.cast("string"), lit(salt)), 1000) < perMille
}
