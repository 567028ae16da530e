package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregate equals direct groupBy totals") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"), sum(col("value").cast("decimal(18,6)")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAggregate(ev, col("event_type"), col("event_id"), 8,
      Map("t" -> col("value").cast("decimal(18,6)")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain inner join") {
    val large = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "v")
    val small = Seq((1, "X"), (2, "Y")).toDF("k", "w")
    val plain = large.join(small, "k").select("k", "v", "w")
      .as[(Int, String, String)].collect().toSet
    val salted = Skew.saltedJoin(large, small, "k", col("v"), 4)
      .select("k", "v", "w").as[(Int, String, String)].collect().toSet
    assert(salted == plain)
  }

  test("salt spreads a hot key over multiple buckets") {
    val hot = (1 to 1000).map(i => (42, i.toLong)).toDF("k", "row_id")
    val buckets = hot.select(Skew.salt(col("row_id"), 8)).distinct().count()
    assert(buckets == 8)
  }
}
