package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asof picks the latest right row at-or-before each left timestamp") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 300L), // user 10
      (4L, 20L, 150L), // user 20: no prior right row -> null
      (5L, 30L, 500L)  // user 30: right exists only for other users
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L, 1000L), // equal ts: inclusive (ties match)
      (10L, 200L, 1001L),
      (10L, 400L, 1002L), // in the future of every left row: never used
      (20L, 200L, 2000L)  // after user 20's left row
    ).toDF("user_id", "ts", "pid")
    val out = AsOfJoin.asofJoin(left, right, "user_id", "ts", Seq("pid"))
      .select("event_id", "pid").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> Some(1000L), // ts 100 == right ts 100: inclusive
      2L -> Some(1001L), // latest of {100, 200}
      3L -> Some(1001L),
      4L -> None,        // right row is later
      5L -> None))       // no right rows for the key
  }

  test("a NULL payload value in the latest right row is returned, not skipped") {
    val left = Seq((1L, 10L, 300L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L, Some(7L)),
      (10L, 200L, None) // the LATEST matching row — its null must win
    ).toDF("user_id", "ts", "pid")
    val out = AsOfJoin.asofJoin(left, right, "user_id", "ts", Seq("pid"))
      .select("pid").as[Option[Long]].collect().toSeq
    assert(out == Seq(None),
      "per-field last(ignoreNulls) would leak the stale pid=7")
  }

  test("right rows with NULL timestamps match nothing") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, Option.empty[Long], 9L)).toDF("user_id", "ts", "pid")
    val out = AsOfJoin.asofJoin(left, right, "user_id", "ts", Seq("pid"))
      .select("pid").as[Option[Long]].collect().toSeq
    assert(out == Seq(None), "l.ts >= NULL is never true")
  }

  test("matches DuckDB-style semantics over testdata purchases") {
    val ev = graft.sources.Tables.events(spark, sf)
    val left = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("pid"))
    val out = AsOfJoin.asofJoin(left, right, "user_id", "ts", Seq("pid"))
    assert(out.count() == left.count(), "left join: every left row survives")
    // spot-check one user against a window-free reference computation
    val u = out.select("user_id").as[Long].head()
    val mine = out.filter(col("user_id") === u)
      .select("event_id", "pid").as[(Long, Option[Long])].collect().toMap
    val rights = right.filter(col("user_id") === u)
      .select("ts", "pid").as[(java.sql.Timestamp, Long)].collect()
    val lefts = left.filter(col("user_id") === u)
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect()
    lefts.foreach { case (eid, lts) =>
      val expect = rights.filter(!_._1.after(lts)).sortBy(_._1.getTime).lastOption.map(_._2)
      assert(mine(eid) == expect, s"event $eid of user $u")
    }
  }
}
