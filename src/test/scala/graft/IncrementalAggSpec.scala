package graft

import org.apache.spark.sql.functions._

import graft.streaming.IncrementalAgg

/** Incremental view maintenance: signed CDC deltas must reproduce the
  * full recompute for count + integral sums, and fully-deleted keys
  * must drop out of the mirror. */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = Seq("k")
  private val sums = Seq("v")

  /** Recompute truth from the surviving multiset. */
  private def truth(rows: Seq[(String, Long)]): Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum))
    }

  private def mirrorMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long)] =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("insert/delete deltas fold exactly; zeroed keys drop out") {
    val m0 = IncrementalAgg.emptyMirror(spark,
      Seq(("x", 1L, "insert")).toDF("k", "v", "_change_type").schema,
      keys, sums)
    // batch 1: pure inserts
    val b1 = Seq(("a", 10L), ("a", 5L), ("b", 7L), ("c", -3L))
      .map { case (k, v) => (k, v, "insert") }
      .toDF("k", "v", "_change_type")
    val m1 = IncrementalAgg.applyDelta(m0, b1, keys, sums)
    val live1 = Seq(("a", 10L), ("a", 5L), ("b", 7L), ("c", -3L))
    assert(mirrorMap(m1) == truth(live1))
    // batch 2: delete one of a's rows, ALL of c, insert a new d and
    // another b — a replacement-commit-shaped mix
    val b2 = (Seq(("a", 5L), ("c", -3L)).map { case (k, v) => (k, v, "delete") } ++
      Seq(("d", 100L), ("b", 1L)).map { case (k, v) => (k, v, "insert") })
      .toDF("k", "v", "_change_type")
    val m2 = IncrementalAgg.applyDelta(m1.localCheckpoint(true), b2, keys, sums)
    val live2 = Seq(("a", 10L), ("b", 7L), ("b", 1L), ("d", 100L))
    assert(mirrorMap(m2) == truth(live2))
    assert(!m2.select("k").as[String].collect().contains("c"),
      "a fully-deleted key must leave the mirror")
    // batch 3: delete-then-reinsert the same row in ONE batch nets out
    val b3 = Seq(("d", 100L, "delete"), ("d", 100L, "insert"),
      ("d", 2L, "insert")).toDF("k", "v", "_change_type")
    val m3 = IncrementalAgg.applyDelta(m2.localCheckpoint(true), b3, keys, sums)
    assert(mirrorMap(m3) == truth(live2 :+ ("d", 2L)))
  }
}
