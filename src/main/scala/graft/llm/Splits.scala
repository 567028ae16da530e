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

  /** Bucket in [0, buckets) from the id's md5. */
  def md5Bucket(id: Column, buckets: Int = Buckets): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") % buckets

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
}
