package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.llm.InvertedIndex
import graft.operators.{Bursts, Scd2}

/** Decision tables for phrase search, SCD2 intervals, burst detection. */
class TemporalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("phrase search: consecutive positions only, with match counts") {
    val docs = Seq(
      (1L, "the table hash join"),        // 1 match at pos 2
      (2L, "table of hash"),              // adjacent but not consecutive
      (3L, "table hash table hash"),      // 2 matches
      (4L, "hash table"),                 // reversed -> no match
      (5L, "")
    ).toDF("doc_id", "text")
    val out = InvertedIndex.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("table", "hash"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 3L -> 2L))
  }

  test("phrase search: three-term phrase aligns all slots") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b x c"), (3L, "x a b c y a b c")
    ).toDF("doc_id", "text")
    val out = InvertedIndex.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 3L -> 2L))
  }

  test("scd2: runs merge, intervals chain, current run open") {
    val ch = Seq(
      (10L, "a", ts("2024-01-01 10:00:00"), 1L),
      (10L, "a", ts("2024-01-01 11:00:00"), 2L), // same value: no new run
      (10L, "b", ts("2024-01-01 12:00:00"), 3L),
      (10L, "a", ts("2024-01-01 13:00:00"), 4L), // back to a: NEW run
      (20L, "x", ts("2024-01-01 09:00:00"), 5L)
    ).toDF("user_id", "v", "ts", "event_id")
    val out = Scd2.intervals(ch, col("user_id"), col("v"), col("ts"),
        col("event_id"))
      .select(col("key"), col("value"), unix_millis(col("valid_from")),
        unix_millis(col("valid_to")))
      .as[(Long, String, Long, Option[Long])].collect().toSet
    def ms(s: String) = ts(s).getTime
    assert(out == Set(
      (10L, "a", ms("2024-01-01 10:00:00"), Some(ms("2024-01-01 12:00:00"))),
      (10L, "b", ms("2024-01-01 12:00:00"), Some(ms("2024-01-01 13:00:00"))),
      (10L, "a", ms("2024-01-01 13:00:00"), None),
      (20L, "x", ms("2024-01-01 09:00:00"), None)))
  }

  test("scd2: same-timestamp different values order by the tie-breaker") {
    val t0 = ts("2024-01-01 10:00:00")
    val ch = Seq((1L, "a", t0, 2L), (1L, "b", t0, 1L))
      .toDF("user_id", "v", "ts", "event_id")
    val out = Scd2.intervals(ch, col("user_id"), col("v"), col("ts"),
        col("event_id"))
      .select("value", "valid_to").as[(String, Option[Timestamp])]
      .collect().toMap
    assert(out == Map("b" -> Some(t0), "a" -> None),
      "tie 1 (b) must precede tie 2 (a)")
  }

  test("scd2: a key whose FIRST value is null keeps its leading run") {
    val ch = Seq(
      (1L, Option.empty[String], ts("2024-01-01 10:00:00"), 1L),
      (1L, Some("a"), ts("2024-01-01 12:00:00"), 2L)
    ).toDF("user_id", "v", "ts", "event_id")
    val out = Scd2.intervals(ch, col("user_id"), col("v"), col("ts"),
        col("event_id"))
      .select("value", "valid_from", "valid_to")
      .as[(Option[String], Timestamp, Option[Timestamp])].collect().toSet
    assert(out == Set(
      (None, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00"))),
      (Some("a"), ts("2024-01-01 12:00:00"), None)),
      s"the null-valued [10:00, 12:00) interval must not vanish: $out")
  }

  test("burst detection: constant series never bursts; a spike does") {
    val base = (0 until 12).flatMap { h =>
      (1 to 10).map(i => ("s", ts(f"2024-01-01 $h%02d:00:00")))
    }
    val spike = (1 to 50).map(_ => ("s", ts("2024-01-01 12:00:00")))
    val df = (base ++ spike).toDF("series", "ts")
    val out = Bursts.detect(df, col("series"),
        date_trunc("hour", col("ts")), lookback = 6, k = 2.0)
      .select("bucket_start_ms", "n", "z", "is_burst")
      .as[(Long, Long, Option[Double], Option[Boolean])]
      .collect().sortBy(_._1)
    // first 6 buckets: no baseline
    out.take(6).foreach { r => assert(r._3.isEmpty && r._4.isEmpty) }
    // buckets 6..11: constant 10 vs mean 10, sd 0 -> z 0, no burst
    out.slice(6, 12).foreach { r =>
      assert(r._2 == 10L && r._3 == Some(0.0) && r._4 == Some(false))
    }
    // bucket 12: n=50 against mean 10 sd 0 -> burst
    assert(out(12)._2 == 50L && out(12)._4 == Some(true))
  }

  test("burst z-score matches the integer-sum variance identity") {
    // counts 4,6,8,10,12,14 then 20: mean=9, var=(4^2+...+14^2)/6-81
    val counts = Seq(4, 6, 8, 10, 12, 14, 20)
    val df = counts.zipWithIndex.flatMap { case (n, h) =>
      (1 to n).map(_ => ("s", ts(f"2024-01-01 $h%02d:00:00")))
    }.toDF("series", "ts")
    val out = Bursts.detect(df, col("series"),
        date_trunc("hour", col("ts")), lookback = 6, k = 2.0)
      .select("n", "z").as[(Long, Option[Double])].collect()
      .sortBy(_._1).last
    val mean = (4 + 6 + 8 + 10 + 12 + 14) / 6.0
    val sumsq = Seq(4, 6, 8, 10, 12, 14).map(x => x * x).sum / 6.0
    val sd = math.sqrt(sumsq - mean * mean)
    val want = math.rint((20.0 - mean) / sd * 1e4) / 1e4
    assert(out == ((20L, Some(want))), s"got $out want $want")
  }

  test("rolling WAU: hand-built window counts") {
    // u1 active day 1 and day 9; u2 active day 1; window 3 days
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")), // same user-day: no double count
      (2L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.operators.Cohorts.rollingActiveUsers(ev,
        col("user_id"), col("ts"), windowDays = 3)
      .select(date_format(col("window_end"), "yyyy-MM-dd"),
        col("active_users"))
      .as[(String, Long)].collect().toMap
    // max day is Jan 9: windows clamp there
    assert(out == Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-03" -> 2L,
      "2024-01-09" -> 1L))
  }

  test("video shared-frame pairs: identical copies pair, others don't") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    def vid(id: Long, seed: Int) = MediaRow(id, "video",
      Array.tabulate(256)(i => ((seed * 31 + i * 7) % 251).toByte),
      MediaMeta(32, 32, 0, 4000L, "fakemp4"))
    val media = Seq(vid(1, 42), vid(2, 42), vid(3, 99),
      MediaRow(4, "image", Array.tabulate(256)(_.toByte),
        MediaMeta(64, 64, 0, 0L, "fakepng")))
    val ds = spark.createDataset(media)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val out = Multimodal.sharedFrameVideoPairs(
        Multimodal.frameHashes(ds), minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 4L)), s"got $out")
  }

  test("frame hashing is a narrow projection (no shuffle)") {
    import graft.multimodal.Multimodal
    val plan = Multimodal.frameHashes(Multimodal.syntheticMedia(spark, 30))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
