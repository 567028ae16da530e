package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies added, removed, changed and unchanged keys") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")))
      .toDF("id", "body")
    val neu = Seq((2L, Some("b")), (3L, Some("C!")), (4L, Some("d")))
      .toDF("id", "body")
    val got = SnapshotDiff.diff(old, neu, col("id"), col("body"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("null content is a value, not absence") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "body")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("now set")))
      .toDF("id", "body")
    val got = SnapshotDiff.diff(old, neu, col("id"), col("body"))
      .as[(Long, String)].collect().toMap
    // null -> null is unchanged; null -> value is changed (never "added")
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("identical snapshots diff to all-unchanged") {
    val snap = (1L to 50L).map(i => (i, s"content $i")).toDF("id", "body")
    val st = SnapshotDiff.diff(snap, snap, col("id"), col("body"))
      .select("status").distinct().as[String].collect().toSeq
    assert(st == Seq("unchanged"))
  }
}
