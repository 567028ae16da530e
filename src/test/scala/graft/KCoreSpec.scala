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
}
