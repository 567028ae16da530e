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

  test("interval self-join: bucket-straddling pairs, boundary inclusivity, " +
    "exactly-once, no cross-key pairs") {
    import graft.operators.IntervalJoin
    val W = 100L
    // ids 1/2: same bucket; 2/3: straddle a bucket boundary (ts 150 vs
    // 210, buckets 1 vs 2) and are within W; 3/4: exactly W apart
    // (inclusive); 4/5: W+1 apart (excluded); 6: other key, same ts as 1
    val df = Seq(
      (1L, 7L, 110L), (2L, 7L, 150L), (3L, 7L, 210L),
      (4L, 7L, 310L), (5L, 7L, 411L),
      (6L, 9L, 110L)
    ).toDF("event_id", "user_id", "ts_ms")
    val pairs = IntervalJoin.selfJoinWithin(df,
      col("user_id"), col("event_id"), col("ts_ms"), W)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(pairs.size == pairs.toSet.size, "duplicate pair emitted")
    // note (1,3): ts 110 vs 210 = exactly W apart AND bucket-straddling
    assert(pairs.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    // differential check vs the naive quadratic formulation, random data
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, 1000L + rnd.nextInt(2000)))
    val got = IntervalJoin.selfJoinWithin(rows.toDF("event_id", "user_id", "ts_ms"),
      col("user_id"), col("event_id"), col("ts_ms"), W)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val naive = (for {
      a <- rows; b <- rows
      if a._2 == b._2 && a._1 < b._1 && math.abs(a._3 - b._3) <= W
    } yield (a._1, b._1)).toSet
    assert(got == naive)
  }
}
