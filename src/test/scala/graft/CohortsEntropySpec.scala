package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import graft.operators.Cohorts

/** Decision tables for the round-6 batch-3 operators: cohort
  * retention, ordered funnel, char entropy, edit-distance pairs. */
class CohortsEntropySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("weekly retention: cohort = first-event week, offsets in weeks") {
    // 2024-01-01 is a Monday. u1 joins week0, active weeks 0 and 2;
    // u2 joins week1, active week1 only; u3 joins week0, active 0,1,2.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-09 10:00:00")),
      (3L, ts("2024-01-03 10:00:00")), (3L, ts("2024-01-08 10:00:00")),
      (3L, ts("2024-01-17 10:00:00")), (3L, ts("2024-01-04 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Cohorts.weeklyRetention(events, col("user_id"), col("ts"))
      .select("cohort_week", "week_offset", "n_users")
      .as[(Date, Long, Long)].collect().toSet
    assert(out == Set(
      (Date.valueOf("2024-01-01"), 0L, 2L), // u1, u3
      (Date.valueOf("2024-01-01"), 1L, 1L), // u3
      (Date.valueOf("2024-01-01"), 2L, 2L), // u1, u3
      (Date.valueOf("2024-01-08"), 0L, 1L)  // u2
    ))
  }

  test("funnel: strictly-after ordering, nulls past the first miss") {
    val events = Seq(
      // u1 completes all three in order
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: view BEFORE signup doesn't count; no view after -> stage 1
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 11:00:00")),
      // u3: same-timestamp view does NOT advance (strict >)
      (3L, "signup", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      // u4: never signs up -> no row
      (4L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Cohorts.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("signup", "view", "purchase"))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("funnel: purchase must follow the view, not just the signup") {
    val events = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")), // before any view
      (1L, "view", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Cohorts.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("signup", "view", "purchase"))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L), "t3 must be null: no purchase after the view")
  }

  test("char_entropy: known distributions") {
    val out = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abab"), (4L, "abcd"),
        (5L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), call_function("char_entropy", col("text")).as("ce"))
      .select(col("doc_id"), col("ce.n_cp"), col("ce.entropy"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, e) => k -> ((n, math.rint(e * 1e9) / 1e9)) }.toMap
    val ln2 = math.rint(math.log(2.0) * 1e9) / 1e9
    val ln4 = math.rint(math.log(4.0) * 1e9) / 1e9
    assert(out(1L) == ((4L, 0.0)))
    assert(!(1.0 / out(1L)._2 < 0), "-0.0 must be normalized to +0.0")
    assert(out(2L) == ((2L, ln2)))
    assert(out(3L) == ((4L, ln2)))
    assert(out(4L) == ((4L, ln4)))
    assert(out(5L) == ((0L, 0.0)))
  }

  test("char_entropy counts astral code points once") {
    val out = Seq((1L, "😀a")) // emoji + 'a' = 2 code points
      .toDF("doc_id", "text")
      .select(call_function("char_entropy", col("text")).as("ce"))
      .select(col("ce.n_cp"), col("ce.entropy"))
      .as[(Long, Double)].head()
    assert(out._1 == 2L)
    assert(math.abs(out._2 - math.log(2.0)) < 1e-12)
  }

  test("levenshtein is code-point based in Spark (documented oracle divergence)") {
    // DuckDB's levenshtein counts BYTES (héllo->hello = 2 there); the
    // engine's counts code points. q96's oracle parity therefore holds
    // on ASCII corpora only — this spec pins the engine semantics.
    val out = Seq(("héllo", "hello"), ("日本語", "日本"))
      .toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).as("d"))
      .as[Int].collect().toSeq
    assert(out == Seq(1, 1))
  }
}
