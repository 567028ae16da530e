package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Library surface for the governance reports (the q141/q142/q150
  * gates delegate here, so a user gets them as plain functions over any
  * DataFrame, not just the fixture tables).
  *
  * All three keep the engine's determinism discipline: integer
  * aggregates, type-stable rendering, ratios as floor-ppm integers —
  * reproducible at any parallelism, which is also what lets a DuckDB
  * oracle hash-check them.
  */
object Profiling {

  private val dec2 = DecimalType(18, 2)

  /** Per-column table profile (Deequ-style): null count, exact distinct
    * count, min/max rendered type-stably (doubles through DECIMAL(18,2)
    * — raw double→string formatting differs between engines), and an
    * HLL-sketch bounds gate (`distinct_in_bounds`) as the 100 TB arm.
    *
    * Shape: per column, the null/min/max pass is ONE map-combinable
    * aggregate over a PRUNED single-column scan, and the exact distinct
    * is a two-level aggregate — never the multi-distinct Expand, which
    * would copy every row once per profiled column into one exchange.
    * At scale keep only the sketch arm; the exact arm is the oracle
    * anchor proving the sketch honest.
    */
  def profile(t: DataFrame, rsd: Double = 0.02): DataFrame = {
    def inBounds(approx: Column, exact: Column): Column =
      abs(approx - exact) <= greatest(lit(5.0), exact * (5 * rsd))
    val parts = t.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val render = f.dataType.typeName match {
        case "double" => (x: Column) => x.cast(dec2).cast("string")
        case _ => (x: Column) => x.cast("string")
      }
      val base = t.agg(count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
        render(min(c)).as("min_s"), render(max(c)).as("max_s"),
        approx_count_distinct(c, rsd).as("ad"))
      val exact = t.select(c).where(c.isNotNull).distinct()
        .agg(count(lit(1)).as("nd"))
      base.crossJoin(exact).select(lit(f.name).as("col_name"),
        col("n_rows"), col("n_nulls"), col("nd").as("n_distinct"),
        col("min_s"), col("max_s"),
        inBounds(col("ad"), col("nd")).as("distinct_in_bounds"))
    }
    parts.reduce(_ unionByName _)
  }

  /** One referential-integrity relation: total fact rows and orphan
    * rows (null-safe left_anti against the distinct dim key). Union
    * several for a star-schema audit (q142). Small dims broadcast; a
    * big-dim relation becomes a shuffle anti-join — with a Bloom
    * pre-filter (BloomPrune) as the cheap first pass at scale. */
  def fkRelation(name: String, fact: DataFrame, key: String,
                 dim: DataFrame, dimKey: String): DataFrame = {
    val orphans = fact.select(col(key).as("k")).where(col("k").isNotNull)
      .join(dim.select(col(dimKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    fact.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans)
      .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"))
  }

  /** Join-key skew statistics for one (table, key): cardinality,
    * heaviest-key share (ppm) and max/mean ratio (×100; 100 = uniform)
    * — the numbers that pick broadcast vs shuffle vs salting before a
    * large join. Two-level map-combinable aggregate over one pruned
    * column. */
  def keySkew(table: String, df: DataFrame, key: String): DataFrame =
    df.select(col(key).as("k")).where(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_distinct"),
        max("c").as("max_key_rows"))
      .select(lit(table).as("table_name"), lit(key).as("key_col"),
        col("n_rows"), col("n_distinct"), col("max_key_rows"),
        floor(lit(1000000.0) * col("max_key_rows") /
          greatest(col("n_rows"), lit(1L))).cast("long").as("top1_ppm"),
        floor(lit(100.0) * col("max_key_rows") * col("n_distinct") /
          greatest(col("n_rows"), lit(1L))).cast("long").as("skew_x100"))
}
