package graft

import org.apache.spark.sql.functions._
import graft.operators.MarkovAttribution

class MarkovAttributionSpec extends SparkTestBase {
  import spark.implicits._

  // u1: A→conv, u2: A→conv, u3: B→(no conversion), u4: B→conv,
  // u5: converts FIRST (start→conv) — its later C event must vanish.
  private def events = Seq(
    (1L, 1L, "A", 101L), (1L, 2L, "P", 102L),
    (2L, 1L, "A", 201L), (2L, 2L, "P", 202L),
    (3L, 1L, "B", 301L),
    (4L, 1L, "B", 401L), (4L, 2L, "P", 402L),
    (5L, 1L, "P", 501L), (5L, 2L, "C", 502L)
  ).toDF("u", "t", "c", "id")

  test("hand-computed removal effects, credits, post-conversion cutoff") {
    val out = MarkovAttribution.removalEffects(events, col("u"), col("t"),
      col("id"), col("c"), col("c") === "P")
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // chain: p(start→A)=p(start→B)=400000, p(start→conv)=200000,
    // p(A→conv)=1e6, p(B→conv)=p(B→null)=500000
    // a(A)=1e6, a(B)=5e5 → base = 2e5 + (4e5·1e6 + 4e5·5e5)/1e6 = 800000
    // remove A → 400000 (RE 500000); remove B → 600000 (RE 250000)
    // credits 666666/333333 of sum 750000; 4 conversions → 2 and 1
    assert(out.toSeq == Seq(
      ("A", 2L, 800000L, 400000L, 500000L, 666666L, 2L, 4L),
      ("B", 2L, 800000L, 600000L, 250000L, 333333L, 1L, 4L)))
    // the post-conversion channel never becomes a state
    assert(!out.map(_._1).contains("C"))
  }

  test("no conversions: zero effects, zero credits, no division blowup") {
    val none = events.filter(col("c") =!= "P")
    val out = MarkovAttribution.removalEffects(none, col("u"), col("t"),
      col("id"), col("c"), col("c") === "P").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("base_cvr_ppm") == 0L)
      assert(r.getAs[Long]("removal_effect_ppm") == 0L)
      assert(r.getAs[Long]("credit_ppm") == 0L)
      assert(r.getAs[Long]("n_conversions") == 0L)
    }
  }

  test("deterministic under repartition") {
    val a = MarkovAttribution.removalEffects(events.repartition(7), col("u"),
      col("t"), col("id"), col("c"), col("c") === "P").collect().toSet
    val b = MarkovAttribution.removalEffects(events, col("u"), col("t"),
      col("id"), col("c"), col("c") === "P").collect().toSet
    assert(a == b)
  }
}
