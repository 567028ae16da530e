package graft

import org.apache.spark.sql.functions._
import graft.llm.Pca
import graft.sources.Tables

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("gramInt8: exact integer moments on a hand-computed fixture") {
    // q = quantized rows: (1,0,0,0) → (127,0,0,0); (2,2,0,0) → (127,127,0,0)
    val vs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(2.0f, 2.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val g = Pca.gramInt8(vs).as[(Long, Long, Long)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    assert(g((-1L, -1L)) == 2L, "row count")
    assert(g((0L, -1L)) == 254L && g((1L, -1L)) == 127L, "first moments")
    assert(g((0L, 0L)) == 127L * 127 * 2, "sum q0²")
    assert(g((0L, 1L)) == 127L * 127, "sum q0·q1 (one row contributes)")
    assert(g((1L, 1L)) == 127L * 127)
    assert(g((2L, 2L)) == 0L && g((0L, 3L)) == 0L)
    // full grid: d(d+1)/2 products + d linear + 1 count
    assert(g.size == 4 * 5 / 2 + 4 + 1)
    // the exchange must be preceded by a map-side partial aggregate
    val plan = Pca.gramInt8(vs).queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial + final aggregate expected")
  }

  test("power iteration recovers a planted dominant direction, components orthonormal") {
    // points stretched 10x along u = (3,4)/5 in dims (0,1), small spread
    // elsewhere: PC1 must align with u
    val u = Seq(0.6, 0.8, 0.0, 0.0)
    val rows = (0 until 40).map { i =>
      val t = (i % 21 - 10) * 1.0            // -10..10 along u
      val n1 = (i % 5 - 2) * 0.05            // small noise dims 2,3
      val n2 = (i % 7 - 3) * 0.05
      (i.toLong,
        Seq((t * u(0)).toFloat, (t * u(1)).toFloat, n1.toFloat, n2.toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val grid = Pca.gramInt8(rows).as[(Long, Long, Long)].collect().toSeq
    val cov = Pca.covariance(grid)
    val comps = Pca.topComponents(cov, 2)
    val pc1 = comps.head
    val cosU = math.abs(pc1(0) * u(0) + pc1(1) * u(1))
    assert(cosU > 0.99, s"PC1 must align with the planted direction, |cos|=$cosU")
    comps.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9, "unit norm")
    }
    val dot12 = comps(0).zip(comps(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-6, "orthogonal components")
    // projection: variance along PC1 dominates PC2 (projection is
    // computed on the RAW floats; the quantized covariance is a scaled
    // proxy, so compare variances, not exact values)
    val proj = Pca.project(rows, comps).select("pc1", "pc2")
      .as[(Double, Double)].collect()
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(proj.map(_._1).toSeq)
    val v2 = variance(proj.map(_._2).toSeq)
    assert(v1 > 10 * v2, s"PC1 variance must dominate: $v1 vs $v2")
  }

  test("covariance of the testdata embeddings is PSD-ish on the diagonal and symmetric by construction") {
    val grid = Pca.gramInt8(Tables.embeddings(spark, sf))
      .as[(Long, Long, Long)].collect().toSeq
    val cov = Pca.covariance(grid)
    assert(cov.length == graft.llm.Similarity.Dims)
    (0 until cov.length).foreach { i =>
      assert(cov(i)(i) >= -1e-9, s"diagonal variance non-negative at $i")
    }
    val comps = Pca.topComponents(cov, 3, iters = 60)
    // eigenvalue estimates (Rayleigh quotients) must be non-increasing
    def rq(v: Array[Double]): Double =
      (0 until v.length).map(i =>
        v(i) * (0 until v.length).map(j => cov(i)(j) * v(j)).sum).sum
    val ev = comps.map(rq)
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-6 },
      s"eigenvalues non-increasing: $ev")
  }

  test("mergeGrams: any batch split merges to the one-shot grid exactly") {
    val emb = Tables.embeddings(spark, sf)
    val oneShot = Pca.gramInt8(emb).as[(Long, Long, Long)].collect().toSet
    val parts = Seq(
      emb.filter(col("vec_id") % 3 === 0).repartition(5),
      emb.filter(col("vec_id") % 3 === 1).repartition(2, col("vec_id")),
      emb.filter(col("vec_id") % 3 === 2))
    val merged = Pca.mergeGrams(parts.map(Pca.gramInt8))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == oneShot)
  }

  test("reduced-dimension candidate generation: 64d -> 10d PCA shortlist keeps recall on clustered data") {
    import graft.llm.Similarity
    // the q161 fixture: 10 planted clusters — low-rank structure PCA
    // must find; scoring in 10d is 6.4x cheaper than 64d, and the
    // reduced-space shortlist + full-dim rerank is the classic
    // two-stage ANN (the PQ/ADC pattern, PCA-flavored)
    val cemb = Similarity.plantedClusters(Tables.embeddings(spark, sf))
    val grid = Pca.gramInt8(cemb).as[(Long, Long, Long)].collect().toSeq
    val comps = Pca.topComponents(Pca.covariance(grid), 10, iters = 60)
    val red = Pca.project(cemb, comps).select(col("vec_id"),
      array((1 to 10).map(k => col(s"pc$k")): _*).as("embedding"))
    val truth = Similarity.bruteForceTopK(cemb, col("vec_id") < 10, 5)
      .select(col("query_id"), col("neighbor_id"))
    // coarse stage: the 10d space must preserve CLUSTER structure —
    // shortlist members overwhelmingly share the query's cluster
    val shortlist20 = Similarity.bruteForceTopK(red, col("vec_id") < 10, 20)
      .select(col("query_id"), col("neighbor_id"))
    val purity = shortlist20
      .filter(col("query_id") % 10 === col("neighbor_id") % 10).count()
      .toDouble / shortlist20.count()
    println(s"[pca-ann] 10d shortlist@20 cluster purity = $purity")
    // fine stage: a cluster-sized 10d shortlist + full-dim rerank must
    // retain the exact truth (the residual directions PCA drops carry
    // the WITHIN-cluster order, so the shortlist must cover the cluster)
    val shortlist60 = Similarity.bruteForceTopK(red, col("vec_id") < 10, 60)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(shortlist60, Seq("query_id", "neighbor_id")).count()
    val total = truth.count()
    assert(total > 0)
    val recall = hits.toDouble / total
    println(s"[pca-ann] 10d shortlist@60 recall of 64d truth@5 = $recall")
    assert(purity >= 0.95,
      s"10d shortlist must stay within the query's cluster: purity=$purity")
    assert(recall >= 0.9,
      s"cluster-sized 10d shortlist must retain the 64d truth@5: recall=$recall")
  }
}
