package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.GraftSession
import graft.sources.Tables

/** Scratch: decimal-per-row vs fixed-point-long q01 formulations,
  * interleaved to cancel machine noise. */
object ProfQ1 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]",
      shufflePartitions = Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dec = DecimalType(18, 6)
    val dec28 = DecimalType(28, 6)
    def decimalQ1 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast(dec)), 2).cast("double").as("sum_qty"),
        round(sum(col("l_extendedprice").cast(dec)), 2).cast("double").as("sum_base_price"),
        round(sum((col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec)))), 2).cast("double")
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    def centsQ1 = {
      val pc = round(col("l_extendedprice") * 100).cast("long")
      val dc = round(col("l_discount") * 100).cast("long")
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).cast("double").as("sum_qty"),
          round(sum(pc).cast(dec28) / 100, 2).cast("double").as("sum_base_price"),
          round(sum(pc * (lit(100L) - dc)).cast(dec28) / 10000, 2).cast("double")
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label: $s%.2f s"); s
    }
    spark.range(1000000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    var (td, tc) = (0.0, 0.0)
    (1 to 4).foreach { i =>
      td += time(s"decimal #$i")(decimalQ1.write.format("noop").mode("overwrite").save())
      tc += time(s"cents   #$i")(centsQ1.write.format("noop").mode("overwrite").save())
    }
    println(f"[prof] TOTAL decimal=$td%.2f cents=$tc%.2f speedup=${td / tc}%.2fx")
    spark.stop()
  }
}
