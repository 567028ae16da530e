package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: same literals, same per-node two-level
    * fold (src-ordered partial sums per `src div FoldBucketWidth`
    * bucket, then bucket-ordered fold), same association order as the
    * operator and the DuckDB oracle. For ids inside one bucket this is
    * bit-identical to the flat ascending-source fold (0.0 + x == x). */
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
          .groupBy(_ / PageRank.FoldBucketWidth).toSeq.sortBy(_._1)
          .map { case (_, us) =>
            us.sorted.foldLeft(0.0)((acc, u) => acc + r(u) / outdeg(u).toDouble)
          }
          .foldLeft(0.0)(_ + _)
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

  test("two-level fold: multi-bucket in-neighbors match the reference bit-for-bit") {
    // one hub whose in-neighbors span several fold buckets, so level 2
    // really folds more than one bucket sum (ids straddle k * 2^20)
    val w = PageRank.FoldBucketWidth
    val hub = 7L
    val srcs = Seq(3L, w - 1L, w, w + 5L, 2 * w + 1L, 5 * w + 9L)
    val edges = srcs.map(u => (u, hub)) ++ Seq((hub, 3L), (3L, w))
    val out = PageRank.ranks(edges.toDF("src", "dst"),
        col("src"), col("dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    val ref = reference(edges, 5, 0.85)
    assert(out.keySet == ref.keySet)
    out.foreach { case (v, r) =>
      assert(r == ref(v), s"node $v: $r != ${ref(v)}")
    }
    // and still partitioning-invariant
    val b = PageRank.ranks(edges.toDF("src", "dst").repartition(7),
        col("src"), col("dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(out == b)
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
