package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM segmentation (Hughes '94 — the classic recency/frequency/
  * monetary customer scoring behind retention and campaign targeting):
  * per customer, days since last order, order count, and lifetime
  * revenue, each scored into its global quintile; the 3-digit
  * `rfm_code` (100·r + 10·f + m) is the segment key a marketer reads
  * ("111" = most-recent/most-frequent/highest-spend under this
  * ascending convention, documented below).
  *
  * Exact-integer contract: recency in whole epoch days, monetary in
  * cents, and the quintile CUTOFFS come from
  * [[IntStats.weightedQuantilesBisect]] (map-combinable value-domain
  * search — never an ntile window, which would global-sort the
  * customer table at scale). Cutoff semantics: smallest value whose
  * cumulative count covers k/5 of the mass, ties land on the LOWER
  * score — deterministic and hash-gateable, the q175 bucketing
  * discipline.
  *
  * Score DIRECTION is ascending in the metric for all three dimensions
  * (r=1 ⇔ most recent since recency_days is small-good; f=1 ⇔ FEWEST
  * orders; m=1 ⇔ lowest spend) — one uniform rule instead of the
  * folk per-dimension flips, so the composite reads consistently and
  * the oracle mirrors one CASE shape three times.
  *
  * Shape: one groupBy over orders, a 1-row broadcast for the global
  * anchor date, 3 bounded bisections (cutoff table is 3×4 values), one
  * broadcast join + CASE for assignment. No window, no collect of row
  * data.
  */
object Rfm {

  /** `(custkey, recency_days, frequency, monetary_cents, r, f, m,
    * rfm_code)` — quintile scores 1..5 ascending in each metric. */
  def scores(orders: DataFrame, custKey: Column, orderDate: Column,
             totalPrice: Column): DataFrame = {
    val perCust = orders
      .select(custKey.as("custkey"),
        (unix_millis(orderDate.cast("timestamp")) / lit(86400000L))
          .cast("long").as("od"),
        round(totalPrice * 100).cast("long").as("cents"))
      .groupBy("custkey")
      .agg(max("od").as("last_od"), count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"))
    val anchor = perCust.agg(max("last_od").as("anchor_od"))
    val base = perCust.crossJoin(broadcast(anchor))
      .select(col("custkey"),
        (col("anchor_od") - col("last_od")).as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qs = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))
    // ONE keyed bisection for all three metrics: the metric name IS the
    // bisection's group key, so the three value-domain searches share
    // every aggregate pass (the search is per-key bracketed) — measured
    // ~3× fewer driver rounds than three separate bisections (bench
    // q220 was this operator's whole cost)
    val melted = base.select(explode(array(
      struct(lit("r").as("mk"), col("recency_days").as("mv")),
      struct(lit("f").as("mk"), col("frequency").as("mv")),
      struct(lit("m").as("mk"), col("monetary_cents").as("mv"))))
      .as("s")).select(col("s.mk"), col("s.mv"))
    val cutRows = IntStats.weightedQuantilesBisect(
      melted, col("mk"), col("mv"), lit(1L), qs,
      unitWeightApproxSeed = true) // w ≡ 1 here; seed cuts ~9 rounds to ~2
      .select(col("k"), col("weighted_qs")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // empty input → no cutoff rows; any placeholder works (the scored
    // frame is empty too), but the schema must still come out
    def cuts(k: String): Seq[Long] =
      cutRows.getOrElse(k, Seq(0L, 0L, 0L, 0L))
    def score(metric: String, c: Seq[Long]): Column =
      when(col(metric) <= c(0), 1)
        .when(col(metric) <= c(1), 2)
        .when(col(metric) <= c(2), 3)
        .when(col(metric) <= c(3), 4)
        .otherwise(5).cast("long")
    val (rc, fc, mc) = (cuts("r"), cuts("f"), cuts("m"))
    val out = base
      .withColumn("r", score("recency_days", rc))
      .withColumn("f", score("frequency", fc))
      .withColumn("m", score("monetary_cents", mc))
      .withColumn("rfm_code", col("r") * 100 + col("f") * 10 + col("m"))
      .localCheckpoint(true)
    base.unpersist()
    out
  }
}
