package graft

import org.apache.spark.sql.functions._

import graft.operators.Modularity

/** Modularity decision table: the textbook two-clique value, the
  * whole-graph zero, negative scores for bad splits, off-graph
  * membership rows ignored. */
class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  private def score(edges: Seq[(Long, Long)],
                    memb: Seq[(Long, Long)]): (Map[Long, (Long, Long, Long, Long)], Long) = {
    val out = Modularity.score(edges.toDF("a", "b"), col("a"), col("b"),
        memb.toDF("node", "c"), col("node"), col("c"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    (out.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap,
      out.head._6)
  }

  private val twoTriangles = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L))

  test("two disjoint triangles as two communities: Q = 1/2 exactly") {
    val memb = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 4L)
    val (perC, q) = score(twoTriangles, memb)
    // each community: 3 nodes, 3 intra edges, degree sum 6,
    // qc = 4*3*6 - 36 = 36; Q = 72 / 144 = 0.5
    assert(perC(1L) == ((3L, 3L, 6L, 36L)), perC.toString)
    assert(perC(4L) == ((3L, 3L, 6L, 36L)), perC.toString)
    assert(q == 500000L)
  }

  test("everything in one community scores exactly zero") {
    val memb = (1L to 6L).map(_ -> 0L)
    val (_, q) = score(twoTriangles, memb)
    assert(q == 0L, "m_c = m and D_c = 2m cancel exactly")
  }

  test("splitting a triangle scores negative (worse than chance)") {
    // K3, membership {1,2} vs {3}: Q = ((12-16) + (0-4)) / 36
    val (perC, q) = score(Seq((1L, 2L), (2L, 3L), (1L, 3L)),
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L))
    assert(perC(0L) == ((2L, 1L, 4L, -4L)), perC.toString)
    assert(perC(1L) == ((1L, 0L, 2L, -4L)), perC.toString)
    assert(q == -222222L, s"truncation toward zero on both engines: $q")
  }

  test("membership rows for nodes outside the graph are ignored") {
    val memb = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 4L, 99L -> 4L, 100L -> 7L)
    val (perC, q) = score(twoTriangles, memb)
    assert(perC(4L)._1 == 3L, "ghost node must not count")
    assert(!perC.contains(7L), "all-ghost community absent")
    assert(q == 500000L)
  }
}
