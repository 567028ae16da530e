package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: same literals, same per-node
    * ascending-source fold, same association order as the operator. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        d: Double): Map[Long, Double] = {
    val e0 = edges.distinct
    val nodes = (e0.map(_._1) ++ e0.map(_._2)).distinct.sorted
    val withLoops = e0 ++ nodes.filterNot(e0.map(_._1).contains)
      .map(v => (v, v))
    val outdeg = withLoops.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size
    var r = nodes.map(v => v -> 1.0 / n.toDouble).toMap
    for (_ <- 1 to iters) {
      val in = withLoops.groupBy(_._2)
      r = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty).map(_._1).sorted
          .foldLeft(0.0)((acc, u) => acc + r(u) / outdeg(u).toDouble)
        val hasIn = in.contains(v)
        v -> ((1.0 - d) / n.toDouble +
          d * (if (hasIn) s else 0.0))
      }.toMap
    }
    r
  }

  test("pagerank matches the driver-side reference bit-for-bit") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 5L), (3L, 1L),
      (4L, 1L))
    val out = PageRank.ranks(edges.toDF("src", "dst"),
        col("src"), col("dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    val ref = reference(edges, 5, 0.85)
    assert(out.keySet == ref.keySet)
    out.foreach { case (v, r) =>
      assert(r == ref(v), s"node $v: $r != ${ref(v)}")
    }
  }

  test("ranks are a probability distribution (self-loop normalization)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L))
    val out = PageRank.ranks(edges.toDF("src", "dst"),
        col("src"), col("dst"), iters = 10)
      .as[(Long, Double)].collect()
    val total = out.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-9, s"ranks sum to $total")
    assert(out.forall(_._2 > 0))
  }

  test("a sink hub accumulates more rank than its spokes") {
    // everyone links to node 99; 99 links only to itself (dangling)
    val edges = (1L to 6L).map(v => (v, 99L))
    val out = PageRank.ranks(edges.toDF("src", "dst"),
        col("src"), col("dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    assert((1L to 6L).forall(v => out(99L) > out(v)))
  }

  test("deterministic across partitionings") {
    val edges = (1L to 40L).map(v => (v, v % 7 + 100L))
    val df = edges.toDF("src", "dst")
    val a = PageRank.ranks(df, col("src"), col("dst"), 5)
      .as[(Long, Double)].collect().toMap
    val b = PageRank.ranks(df.repartition(13), col("src"), col("dst"), 5)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
