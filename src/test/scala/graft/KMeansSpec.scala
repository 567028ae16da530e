package graft

import org.apache.spark.sql.functions._

import graft.llm.{KMeans, Similarity}

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = graft.sources.Tables.embeddings(spark, sf)

  /** Driver-side replay of the pinned semantics (fixed-point means,
    * cosine argmax with lowest-cell ties) for differential testing. */
  private def reference(data: Seq[(Long, Seq[Float])], k: Int,
      iters: Int): Map[Long, Int] = {
    val seed = data.sortBy { case (id, _) =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id)
    }.take(k).map(_._2.map(_.toDouble))
    def assignAll(cents: Seq[Seq[Double]]): Map[Long, Int] =
      data.map { case (id, e) =>
        val scores = cents.map { c =>
          val dot = e.zip(c).foldLeft(0.0) { case (a, (x, p)) => a + x.toDouble * p }
          dot / math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
        }
        id -> scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2
      }.toMap
    var cents = seed
    for (_ <- 1 to iters) {
      val asn = assignAll(cents)
      val byCell = data.groupBy { case (id, _) => asn(id) }
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case None => cents(c)
          case Some(members) =>
            val dims = members.head._2.length
            (0 until dims).map { d =>
              val s = members.map { case (_, e) =>
                math.floor(e(d).toDouble * KMeans.FixedPointScale).toLong
              }.sum
              s.toDouble / (members.size.toDouble * KMeans.FixedPointScale)
            }
        }
      }
    }
    assignAll(cents)
  }

  test("every vector assigned exactly once; counts sum to N") {
    val asn = KMeans.assign(vecs)
    val n = vecs.count()
    assert(asn.count() == n)
    assert(asn.select("vec_id").distinct().count() == n)
    val cells = asn.select("cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < KMeans.K))
  }

  test("assignment matches the driver-side reference replay (differential)") {
    val data = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val want = reference(data, KMeans.K, KMeans.Iters)
    val got = KMeans.assign(vecs).as[(Long, Int)].collect().toMap
    assert(got.size == want.size)
    val diffs = want.collect { case (id, c) if got(id) != c => id }
    assert(diffs.isEmpty, s"assignments diverge for ids ${diffs.take(5)}")
  }

  test("deterministic under repartitioning") {
    val a = KMeans.assign(vecs).as[(Long, Int)].collect().toMap
    val b = KMeans.assign(vecs.repartition(13)).as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("an emptied cell carries its previous centroid") {
    // all-identical vectors: both seed centroids coincide, the argmax
    // tie sends every vector to the lower cell, the other cell empties
    val same = Seq.tabulate(6)(i => (i.toLong, Seq.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val cents = KMeans.fitCentroids(same, k = 2, iters = 2)
    assert(cents.size == 2)
    assert(cents(0) == cents(1), "empty cell must keep the (identical) seed")
    val asn = KMeans.assign(same, k = 2, iters = 2).as[(Long, Int)].collect()
    assert(asn.forall(_._2 == 0))
  }

  test("lloyd rounds do not decrease the spherical objective") {
    val data = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    def objective(cents: Seq[Seq[Double]]): Double = data.map { case (_, e) =>
      cents.map { c =>
        val dot = e.zip(c).foldLeft(0.0) { case (a, (x, p)) => a + x.toDouble * p }
        dot / math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      }.max
    }.sum
    val c0 = Similarity.centroidSeq(vecs, KMeans.K)
    val c3 = KMeans.fitCentroids(vecs, KMeans.K, KMeans.Iters)
    // mean-direction update is the spherical-k-means ascent step; the
    // 1e-7 quantization can only perturb below float noise
    assert(objective(c3) >= objective(c0) - 1e-6)
  }
}
