package graft

import graft.operators.Expectations
import Expectations._

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  // id 4 duplicated; one null name; value 99.5 out of [0,50]; kind 'x' off-list
  private def frame = Seq(
    (Some(1L), Some("a"), 10.0, "good"),
    (Some(2L), None, 20.0, "good"),
    (Some(4L), Some("c"), 99.5, "x"),
    (Some(4L), Some("d"), 30.0, "good"),
    (None: Option[Long], Some("e"), 40.0, "good")
  ).toDF("id", "name", "value", "kind")

  test("every rule type reports the right violation count and verdict") {
    val report = Expectations.check(frame, Seq(
      NotNull("id"), NotNull("value"),
      Unique("id"),
      InRange("value", 0.0, 50.0),
      InSet("kind", Seq("good", "bad")),
      MinRows(10L)))
      .as[(String, String, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(report(("not_null", "id")) == (1.0, false))
    assert(report(("not_null", "value")) == (0.0, true))
    assert(report(("unique", "id")) == (1.0, false)) // one duplicated key
    assert(report(("in_range(0.0,50.0)", "value")) == (1.0, false))
    assert(report(("in_set", "kind")) == (1.0, false))
    assert(report(("min_rows", "")) == (5.0, false))
  }

  test("nulls violate range and set membership; null keys can be duplicates") {
    val df = Seq(
      (Some(1.0), Option.empty[String]),
      (Option.empty[Double], Some("a")),
      (Option.empty[Double], Some("a"))
    ).toDF("v", "k")
    val report = Expectations.check(df, Seq(
      InRange("v", 0.0, 10.0), InSet("k", Seq("a")), Unique("v")))
      .as[(String, String, Double, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(report("in_range(0.0,10.0)") == (2.0, false)) // both nulls violate
    assert(report("in_set") == (1.0, false))             // the null k violates
    assert(report("unique") == (1.0, false))             // two null keys collide
  }

  test("a clean table passes everything") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "kind")
    val ok = Expectations.check(df, Seq(
      NotNull("id"), Unique("id"), InSet("kind", Seq("a", "b")), MinRows(2L)))
      .select("passed").as[Boolean].collect()
    assert(ok.length == 4 && ok.forall(identity))
  }
}
