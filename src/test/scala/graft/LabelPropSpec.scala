package graft

import org.apache.spark.sql.functions._

import graft.llm.LabelProp

/** Label propagation decision table: bounded-hop spread, synchronous
  * majority with the smallest-label tie rule, seed clamping,
  * repartition determinism. */
class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  private def run(nodes: Seq[(Long, Option[Int])], pairs: Seq[(Long, Long)],
                  rounds: Int = 4): Map[Long, Option[Int]] = {
    val n = nodes.toDF("id", "seed")
    val p = pairs.toDF("doc_a", "doc_b")
    LabelProp.propagate(n, col("id"), col("seed"), p,
      col("doc_a"), col("doc_b"), rounds)
      .as[(Long, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> r._3).toMap
  }

  test("labels travel at most `rounds` hops along a chain") {
    val nodes = (1L to 6L).map(i => i -> (if (i == 1) Some(1) else None))
    val chain = (1L to 5L).map(i => (i, i + 1))
    val out = run(nodes, chain, rounds = 4)
    assert(out(1L) == Some(1) && out(2L) == Some(1) && out(3L) == Some(1) &&
      out(4L) == Some(1) && out(5L) == Some(1),
      s"distance <= 4 from the seed must be labeled: $out")
    assert(out(6L).isEmpty, "distance 5 is beyond the 4-round horizon")
  }

  test("synchronous majority vote; ties take the smallest label") {
    // c's neighbors: two seeds 0, one seed 1 -> majority 0
    // t's neighbors: one seed 0, one seed 1 -> tie -> 0
    val nodes = Seq(
      1L -> Some(1), 2L -> Some(0), 3L -> Some(0), 4L -> None, // c = 4
      5L -> Some(1), 6L -> Some(0), 7L -> None) // t = 7
    val pairs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (5L, 7L), (6L, 7L))
    val out = run(nodes, pairs, rounds = 1)
    assert(out(4L) == Some(0), "majority wins")
    assert(out(7L) == Some(0), "tie takes the smallest label")
  }

  test("seeds are clamped whatever the neighborhood says") {
    val nodes = Seq(1L -> Some(1), 2L -> Some(0), 3L -> Some(0))
    val pairs = Seq((1L, 2L), (1L, 3L))
    val out = run(nodes, pairs, rounds = 4)
    assert(out == Map(1L -> Some(1), 2L -> Some(0), 3L -> Some(0)))
  }

  test("no labeled neighbor keeps the previous state; an acquired " +
    "label persists when its source stays") {
    // 1(seed)-2-3: round 1 labels 2; round 2 labels 3; 2 keeps its
    // label in later rounds (labeled neighbor 1 still votes).
    val nodes = Seq(1L -> Some(1), 2L -> None, 3L -> None)
    val out = run(nodes, Seq((1L, 2L), (2L, 3L)), rounds = 3)
    assert(out == Map(1L -> Some(1), 2L -> Some(1), 3L -> Some(1)))
  }

  test("deterministic under repartition") {
    val nodes = (1L to 40L).map(i =>
      i -> (if (i % 7 == 0) Some((i % 2).toInt) else None))
    val pairs = (1L to 39L).map(i => (i, i + 1)) ++
      Seq((1L, 20L), (5L, 35L), (10L, 30L))
    val a = run(nodes, pairs)
    val n = nodes.toDF("id", "seed").repartition(7)
    val p = pairs.toDF("doc_a", "doc_b").repartition(5)
    val b = LabelProp.propagate(n, col("id"), col("seed"), p,
      col("doc_a"), col("doc_b"), 4)
      .as[(Long, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(a == b)
  }
}
