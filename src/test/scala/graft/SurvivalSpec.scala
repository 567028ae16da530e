package graft

import org.apache.spark.sql.functions._

import graft.operators.Survival

/** Kaplan–Meier decision table: the textbook worked example, censoring
  * vs naive bias, all-censored flatline, integer-floor semantics. */
class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  private def km(obs: Seq[(Long, Boolean)]): Map[Long, (Long, Long, Long, Long)] = {
    Survival.kaplanMeier(obs.toDF("t", "e"), col("t"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("textbook case: deaths at 1 and 3, censor at 2") {
    // t=1: n=3, d=1 -> s = 2/3; t=2: censored only -> s keeps 666666
    // exactly; t=3: n=1, d=1 -> s = 0
    val out = km(Seq((1L, true), (2L, false), (3L, true)))
    assert(out(1L) == ((3L, 1L, 0L, 666666L)), out.toString)
    assert(out(2L) == ((2L, 0L, 1L, 666666L)), out.toString)
    assert(out(3L) == ((1L, 1L, 0L, 0L)), out.toString)
  }

  test("censoring lifts survival above the naive all-events curve") {
    // same durations; in (a) the long spells are censored, in (b) they
    // "ended" — KM at t=1 must be identical, but (a) never drops to 0
    val a = km(Seq((1L, true), (5L, false), (5L, false)))
    val b = km(Seq((1L, true), (5L, true), (5L, true)))
    assert(a(1L)._4 == b(1L)._4 && a(1L)._4 == 666666L)
    assert(a(5L)._4 == 666666L, "censored tail keeps survival")
    assert(b(5L)._4 == 0L, "observed deaths exhaust it")
  }

  test("ties at one time fold once: 2 of 4 die at t=2") {
    val out = km(Seq((2L, true), (2L, true), (2L, false), (2L, false)))
    assert(out(2L) == ((4L, 2L, 2L, 500000L)), out.toString)
  }

  test("all censored: the curve never leaves 1e6") {
    val out = km(Seq((1L, false), (2L, false), (3L, false)))
    assert(out.values.forall(_._4 == 1000000L), out.toString)
    assert(out(2L)._1 == 2L, "at-risk still decrements")
  }

  test("empty input yields an empty life table") {
    assert(km(Seq.empty).isEmpty)
  }
}
