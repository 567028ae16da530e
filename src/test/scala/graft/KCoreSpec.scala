package graft

import org.apache.spark.sql.functions._

import graft.operators.KCore

/** k-core decision table: clique survival, star/chain peeling,
  * multi-wave cascades, canonicalization, the converged gate under a
  * starved round budget. */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)], k: Int,
                  maxRounds: Int = 64): (Map[Long, Long], Boolean) = {
    val out = KCore.subgraph(pairs.toDF("a", "b"), col("a"), col("b"),
      k, maxRounds).as[(Long, Long, Boolean)].collect()
    (out.map(r => r._1 -> r._2).toMap, out.forall(_._3))
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j))

  test("a clique with pendant leaves: the 3-core is exactly the clique") {
    // K4 on 1..4 plus a leaf hanging off each clique node
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      (1L to 4L).map(i => (i, i + 10L))
    val (core, conv) = run(edges, k = 3)
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core.toString)
    assert(conv)
  }

  test("star: hub degree is huge but the 2-core is empty") {
    val (core, conv) = run((1L to 20L).map(i => (100L, i)), k = 2)
    assert(core.isEmpty, core.toString)
    assert(conv)
  }

  test("lollipop chain peels in cascading waves back to the triangle") {
    // triangle {1,2,3} with tail 3-4-5-6-7: each k=2 round removes only
    // the current tail end, so fixpoint needs as many waves as the tail
    // is long — the multi-round cascade path.
    val edges = clique(Seq(1L, 2L, 3L)) ++
      Seq((3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val (core, conv) = run(edges, k = 2)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    assert(conv)
  }

  test("starved round budget stops early and reports converged = false") {
    val edges = clique(Seq(1L, 2L, 3L)) ++
      Seq((3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val (core, conv) = run(edges, k = 2, maxRounds = 1)
    assert(!conv, "one round cannot reach the lollipop fixpoint")
    assert(core.contains(5L), "tail interior not yet peeled after round 1")
  }

  test("direction, duplicates and self-loops are canonicalized away") {
    val dirty = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L), (1L, 2L))
    val (core, conv) = run(dirty, k = 2)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    assert(conv)
  }

  test("k larger than any degree yields an empty, converged core") {
    val (core, conv) = run(clique(Seq(1L, 2L, 3L, 4L)), k = 10)
    assert(core.isEmpty && conv)
  }

  private def cores(pairs: Seq[(Long, Long)]): (Map[Long, Long], Boolean) = {
    val out = KCore.coreness(pairs.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Boolean)].collect()
    (out.map(r => r._1 -> r._2).toMap, out.forall(_._3))
  }

  test("coreness: K4 with pendant leaves is 3 inside, 1 on the leaves") {
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      (1L to 4L).map(i => (i, i + 10L))
    val (c, conv) = cores(edges)
    assert((1L to 4L).forall(c(_) == 3L), c.toString)
    assert((11L to 14L).forall(c(_) == 1L), c.toString)
    assert(conv)
  }

  test("coreness: star hub is 1 despite its huge degree") {
    val (c, conv) = cores((1L to 20L).map(i => (100L, i)))
    assert(c.values.forall(_ == 1L), c.toString)
    assert(conv)
  }

  test("coreness: lollipop — triangle 2, tail 1; consistent with subgraph") {
    val edges = clique(Seq(1L, 2L, 3L)) ++
      Seq((3L, 4L), (4L, 5L), (5L, 6L))
    val (c, conv) = cores(edges)
    assert(c == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L,
      6L -> 1L), c.toString)
    assert(conv)
    // cross-check: nodes with coreness >= 2 are exactly the 2-core
    val (core2, _) = run(edges, k = 2)
    assert(core2.keySet == c.filter(_._2 >= 2L).keySet)
  }

  test("coreness: two cliques joined by a bridge keep their own cores") {
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((4L, 10L))
    val (c, conv) = cores(edges)
    assert((1L to 4L).forall(c(_) == 3L), c.toString)
    assert(Seq(10L, 11L, 12L).forall(c(_) == 2L), c.toString)
    assert(conv)
  }
}
