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

  test("clustering coefficient: clique 1.0, star 0, lollipop graded") {
    import graft.operators.Triangles.clusteringCoef
    val edges = clique(Seq(1L, 2L, 3L)) ++ Seq((3L, 4L), (4L, 5L))
    val out = clusteringCoef(edges.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 1L, 1000000L)), out.toString)
    assert(out(3L) == ((3L, 1L, 333333L)), "1 of C(3,2) pairs linked")
    assert(out(4L) == ((2L, 0L, 0L)), out.toString)
    assert(out(5L) == ((1L, 0L, 0L)), "deg < 2 is 0 by definition")
  }

  test("assortativity: symmetric moments; star is exactly -1, clique null") {
    import graft.operators.Triangles.degreeAssortativity
    def r(edges: Seq[(Long, Long)]) =
      degreeAssortativity(edges.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
        .collect().head
    val star = r((1L to 5L).map(i => (9L, i)))
    assert(star._2 == star._3 && star._5 == star._6,
      "symmetrization makes the moments equal")
    assert(star._7.contains(-1.0), s"perfect hub-spoke anticorrelation: $star")
    val k4 = r(clique(Seq(1L, 2L, 3L, 4L)))
    assert(k4._7.isEmpty, "constant degrees have no defined correlation")
  }

  private def incr(base: Seq[(Long, Long)],
                   delta: Seq[(Long, Long)]): Map[Long, Long] = {
    import graft.operators.Triangles.countPerNodeIncremental
    countPerNodeIncremental(base.toDF("a", "b"), col("a"), col("b"),
        delta.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
  }

  test("incremental == one-shot, whatever the delta composition") {
    // mixed graph: cliques, chains, hubs
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L)) ++
      Seq((4L, 5L), (7L, 8L), (8L, 1L), (2L, 6L), (3L, 7L))
    val full = run(edges)
    // every 20%/50%/80% split must reproduce the one-shot counts
    for (k <- Seq(2, 5, 8)) {
      val (d, b) = edges.zipWithIndex.partition(_._2 % 10 < k)
      val got = incr(b.map(_._1), d.map(_._1))
      assert(got == full, s"split $k: $got vs $full")
    }
    // all-delta (empty base) and all-base degenerate cases
    assert(incr(Seq.empty, edges) == full)
    assert(incr(edges, Seq.empty) == full)
  }

  test("incremental: multi-delta-edge triangles count once; dup deltas ignored") {
    // triangle {1,2,3} entirely in the delta; (4,5) duplicates a base edge
    val base = Seq((3L, 4L), (4L, 5L))
    val delta = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (2L, 1L))
    val got = incr(base, delta)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), got.toString)
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
