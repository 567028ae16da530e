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

  test("splitJoin on a skewed key: equals the plain join, routes the hot " +
    "key through a broadcast branch and the rest through the shuffle join") {
    // 1000 rows on one hot key + a sprinkle of light keys, incl. a null
    // key (inner-join semantics: dropped on both routes) and a key with
    // no match on the small side
    val large = ((1 to 1000).map(i => (Some(42), s"h$i")) ++
      Seq((Some(1), "a"), (Some(1), "b"), (Some(2), "c"), (Some(7), "x"),
        (None, "n"))).toDF("k", "v")
    val small = Seq((Some(42), "HOT"), (Some(1), "X"), (Some(2), "Y"),
      (None, "NULL")).toDF("k", "w")
    val plain = large.join(small, Seq("k"))
      .as[(Option[Int], String, String)].collect().toSet
    // auto-broadcast off: the toy's light side would otherwise broadcast
    // too and hide the routing; the HEAVY branch's broadcast is an
    // explicit hint, which survives the threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val split = Skew.splitJoin(large, small, "k", topN = 1, minCount = 2)
      assert(split.as[(Option[Int], String, String)].collect().toSet == plain)
      val plan = split.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"hot key must take a broadcast route:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"light keys must take the shuffle route:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("splitJoin on a uniform key degenerates to one plain join") {
    val large = (1 to 20).map(i => (i, s"v$i")).toDF("k", "v")
    val small = (1 to 20).map(i => (i, s"w$i")).toDF("k", "w")
    // every key appears once < minCount: the probe finds nothing heavy
    val out = Skew.splitJoin(large, small, "k", topN = 4, minCount = 2)
    assert(out.count() == 20)
    assert(!out.queryExecution.executedPlan.toString.contains("Union"),
      "uniform input must not pay the two-branch plan")
  }
}
