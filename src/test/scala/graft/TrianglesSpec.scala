package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Triangle counting decision table: clique closed forms, orientation
  * correctness on hub graphs, input canonicalization (direction, dups,
  * self-loops), and triangle-free graphs. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("a", "b")
    Triangles.countPerNode(df, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j))

  test("K4: every node sits in C(3,2)=3 triangles") {
    val out = run(clique(Seq(1L, 2L, 3L, 4L)))
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), out.toString)
  }

  test("K5 minus one edge: closed-form per-node counts") {
    // drop edge (1,2): nodes 1 and 2 lose the 3 triangles through it;
    // each of 3,4,5 loses exactly the one triangle {1,2,x}.
    val edges = clique(Seq(1L, 2L, 3L, 4L, 5L)).filterNot(_ == (1L, 2L))
    val out = run(edges)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 5L, 4L -> 5L, 5L -> 5L),
      out.toString)
  }

  test("paths, stars and bipartite graphs have no triangles") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty, "path")
    assert(run((2L to 9L).map(i => (1L, i))).isEmpty, "star hub")
    assert(run(for (u <- 1L to 3L; v <- 10L to 12L) yield (u, v)).isEmpty,
      "K3,3 is bipartite")
  }

  test("direction, duplicate edges and self-loops are canonicalized away") {
    // the same K3 asserted every dirty way: reversed edges, repeats, loops
    val dirty = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (1L, 1L), (2L, 2L), (1L, 2L))
    assert(run(dirty) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub graph: orientation points every hub edge inward, counts exact") {
    // hub 100 linked to 1..10, plus ring edges (i, i+1) among the spokes:
    // triangle {hub, i, i+1} for i in 1..9 -> hub in 9, spoke ends in 1,
    // interior spokes in 2.
    val edges = (1L to 10L).map(i => (100L, i)) ++
      (1L to 9L).map(i => (i, i + 1))
    val out = run(edges)
    assert(out(100L) == 9L, s"hub: $out")
    assert(out(1L) == 1L && out(10L) == 1L, s"ends: $out")
    assert((2L to 9L).forall(out(_) == 2L), s"interior: $out")
  }
}
