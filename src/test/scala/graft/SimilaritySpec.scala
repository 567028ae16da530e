package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sf)

  test("brute-force top-k: k rows per query, ranked by cosine desc") {
    val out = Similarity.bruteForceTopK(vecs, col("vec_id") < 3, 5)
      .orderBy("query_id", "rank").collect()
    assert(out.length == 15)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cos = rows.sortBy(_.getLong(2)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse, "cosine must be non-increasing in rank")
    }
  }

  test("identical vector is its own nearest neighbor with cosine 1") {
    val dup = vecs.filter(col("vec_id") === 0)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
    val withDup = vecs.unionByName(dup)
    val top = Similarity.bruteForceTopK(withDup, col("vec_id") === 0, 1).collect()
    assert(top.head.getLong(1) == 100000L)
    assert(top.head.getDouble(3) == 1.0)
  }

  test("LSH buckets a duplicate into the same bucket in every table") {
    val dup = vecs.filter(col("vec_id") === 0)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
    val b = Similarity.bucketed(vecs.unionByName(dup))
      .filter(col("vec_id").isin(0L, 100000L))
      .groupBy("t", "sig").count()
    assert(b.collect().forall(_.getLong(2) == 2))
  }

  test("IVF partitions vectors into exactly one cell each") {
    val cents = Similarity.centroidSeq(vecs, Similarity.IvfCells)
    assert(cents.length == Similarity.IvfCells)
    val assigned = Similarity.assignCells(vecs, cents)
    assert(assigned.count() == vecs.count(), "one row (one cell) per vector")
    assert(assigned.filter(col("cell") < 0 ||
      col("cell") >= Similarity.IvfCells).count() == 0)
  }

  test("IVF with full probe (nProbe = nCells) equals exhaustive brute force") {
    val full = Similarity.ivfTopK(vecs, col("vec_id") < 5, 5,
      nCells = Similarity.IvfCells, nProbe = Similarity.IvfCells)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val brute = Similarity.bruteForceTopK(vecs, col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(full == brute,
      "probing every cell must reduce IVF to exact search")
  }

  test("PQ with a corpus-sized shortlist equals exhaustive brute force") {
    val n = vecs.count().toInt
    val pq = Similarity.pqTopK(vecs, col("vec_id") < 5, 5, shortlist = n)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val brute = Similarity.bruteForceTopK(vecs, col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(pq == brute,
      "a shortlist covering the corpus must reduce PQ/ADC to exact search")
  }

  test("PQ codes: one code per subspace, in range, sample vectors at distance 0") {
    val book = Similarity.pqCodebook(vecs)
    assert(book.length == Similarity.PqM &&
      book.forall(_.length == Similarity.PqKs) &&
      book.forall(_.forall(_.length == Similarity.PqSub)))
    val codes = Similarity.pqEncode(vecs, book)
    assert(codes.count() == vecs.count())
    val bad = codes.filter(size(col("code")) =!= Similarity.PqM ||
      exists(col("code"), c => c < 0 || c >= Similarity.PqKs)).count()
    assert(bad == 0)
    // each codebook-sample vector's own subvector is at distance 0, so
    // its code points at a centroid with an IDENTICAL subvector
    val sampleIds = vecs.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(Similarity.PqKs).select("vec_id").as[Long].collect().toSet
    val sampleCodes = codes.filter(col("vec_id").isin(sampleIds.toSeq: _*))
      .select("vec_id", "code").as[(Long, Seq[Int])].collect()
    val full = vecs.filter(col("vec_id").isin(sampleIds.toSeq: _*))
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    sampleCodes.foreach { case (id, code) =>
      code.zipWithIndex.foreach { case (cid, m) =>
        val own = full(id).slice(m * Similarity.PqSub, (m + 1) * Similarity.PqSub)
          .map(_.toDouble).toSeq
        assert(book(m)(cid) == own,
          s"sample $id subspace $m: code $cid is not a zero-distance centroid")
      }
    }
  }

  test("IVF candidates carry exact cosines (rerank is not approximated)") {
    val ivf = Similarity.ivfTopK(vecs, col("vec_id") < 5, 5)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    val brute = Similarity.bruteForceTopK(vecs, col("vec_id") < 5, Int.MaxValue)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    ivf.foreach { case (q, n, c) => assert(brute((q, n)) == c) }
  }

  test("native cosine_d expression is bit-identical to the HOF formulation") {
    val pairs = vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(vecs.select(col("vec_id").as("v2"), col("embedding").as("e2"))
        .filter(col("v2") < 20))
      .filter(col("vec_id") < 40)
    val out = pairs.select(
      Similarity.cosineD(col("embedding"), col("e2")).as("native"),
      Similarity.cosineHof(col("embedding"), col("e2")).as("hof"))
      .as[(Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h), s"native=$n hof=$h")
    }
  }

  test("native lsh_sigs is bit-identical to the per-table HOF signatures") {
    val hofSigs = array((0 until Similarity.NumTables).map(t =>
      Similarity.signatureHof(col("embedding"), t)): _*)
    val out = vecs.limit(200).select(
      col("vec_id"),
      call_function("lsh_sigs", col("embedding")).as("native"),
      hofSigs.as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"vec ${r.getLong(0)}: native=${r.getSeq[String](1)} hof=${r.getSeq[String](2)}")
    }
  }

  test("native lsh_sigs_int equals the bit-string signatures on shared planes") {
    // tables/bits within the classic (NumTables, NumBits) range share
    // the same md5 planes, so the int signature's bit j must equal the
    // string signature's char j
    val out = vecs.limit(200).select(
      col("vec_id"),
      Similarity.sigsInt(col("embedding"),
        Similarity.NumTables, Similarity.NumBits).as("ints"),
      call_function("lsh_sigs", col("embedding")).as("strs")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ints = r.getSeq[Long](1)
      val strs = r.getSeq[String](2)
      ints.zip(strs).foreach { case (iv, sv) =>
        val fromStr = sv.zipWithIndex.collect {
          case ('1', j) => 1L << j
        }.sum
        assert(iv == fromStr, s"vec ${r.getLong(0)}: int=$iv str=$sv")
      }
    }
  }

  test("lsh_sigs_int on a dimension-mismatched embedding yields all-zero sigs") {
    // the LshSigsExpr contract: wrong-length vectors bucket to sig 0 in
    // every table rather than crashing the shard
    val bad = Seq((1L, Seq(0.5f, -0.5f))).toDF("vec_id", "embedding")
    val sigs = bad.select(Similarity.sigsInt(col("embedding")))
      .head().getSeq[Long](0)
    assert(sigs.length == Similarity.MpTables && sigs.forall(_ == 0L))
  }

  test("multi-probe at Hamming 0 on the classic planes equals single-probe LSH") {
    val mp = Similarity.multiProbeLshTopK(vecs, col("vec_id") < 5, 5,
      nTables = Similarity.NumTables, nBits = Similarity.NumBits, hamming = 0)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val single = Similarity.lshTopK(vecs, col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(mp == single,
      "zero-radius multi-probe must reduce to the exact-bucket join")
  }

  test("probe masks: count, popcount bound, deterministic order") {
    val m = Similarity.probeMasks(8, 2)
    assert(m.length == 1 + 8 + 28)
    assert(m.distinct.length == m.length)
    assert(m.forall(v => java.lang.Long.bitCount(v) <= 2))
    assert(m.take(9) == Seq(0L, 1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
  }

  test("store-2 IVF with full probe equals brute force; store widens candidates") {
    val cents = graft.llm.KMeans.fitCentroids(vecs,
      Similarity.IvfKmeansCells, Similarity.IvfKmeansIters)
    val full = Similarity.ivfTopKWith(vecs, cents, col("vec_id") < 5, 5,
      nProbe = Similarity.IvfKmeansCells, store = 2)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val brute = Similarity.bruteForceTopK(vecs, col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(full == brute, "full probe must reduce store-2 IVF to exact search")
    // redundant assignment really indexes each vector `store` times
    val assigned = vecs.select(col("vec_id"),
      explode(Similarity.topCells(col("embedding"), cents, 2)).as("cell"))
    assert(assigned.count() == vecs.count() * 2)
  }

  test("production arms are deterministic under repartitioning") {
    val a = Similarity.ivfKmeansTopK(vecs, col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val b = Similarity.ivfKmeansTopK(vecs.repartition(13), col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(a == b, "kmeans-IVF result must not depend on partitioning")
    val c = Similarity.multiProbeLshTopK(vecs, col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val d = Similarity.multiProbeLshTopK(vecs.repartition(7), col("vec_id") < 5, 5)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(c == d, "multi-probe result must not depend on partitioning")
  }

  test("native top_cells assignment equals the HOF argmax formulation") {
    val cents = Similarity.centroidSeq(vecs, Similarity.IvfCells)
    val native = Similarity.assignCells(vecs, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toSeq.sorted
    val hof = Similarity.assignCellsHof(vecs, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toSeq.sorted
    assert(native.nonEmpty && native == hof)
  }

  test("native top_cells probe order equals the HOF sort-by-(-score,cid) order") {
    val cents = Similarity.centroidSeq(vecs, Similarity.IvfCells)
    def centroidScoreHof(emb: org.apache.spark.sql.Column, c: Seq[Double]) = {
      val dot = aggregate(
        zip_with(emb, typedLit(c), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      dot / lit(math.sqrt(c.map(x => x * x).sum))
    }
    val probeStructs = array(cents.zipWithIndex.map { case (c, i) =>
      struct((-centroidScoreHof(col("embedding"), c)).as("ns"),
        lit(i).cast("int").as("cid"))
    }: _*)
    val out = vecs.limit(200).select(
      col("vec_id"),
      Similarity.topCells(col("embedding"), cents, Similarity.IvfProbe).as("native"),
      transform(slice(array_sort(probeStructs), 1, Similarity.IvfProbe),
        p => p.getField("cid")).as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: native=${r.getSeq[Int](1)} hof=${r.getSeq[Int](2)}")
    }
  }

  test("top_cells on a dimension-mismatched embedding yields no cells") {
    val cents = Similarity.centroidSeq(vecs, Similarity.IvfCells)
    // a malformed (truncated) vector must NOT get a plausible-looking
    // prefix ranking — the mismatch case is defined as empty (round-3
    // advice)
    val out = vecs.limit(5)
      .select(Similarity.topCells(
        slice(col("embedding"), 1, 3), cents, Similarity.IvfProbe).as("cells"))
      .collect()
    assert(out.nonEmpty && out.forall(_.getSeq[Int](0).isEmpty))
  }

  test("LSH candidates are a subset of the full space and rerank is exact") {
    val lsh = Similarity.lshTopK(vecs, col("vec_id") < 5, 5)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(vecs, col("vec_id") < 5, Int.MaxValue)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    // every LSH-scored pair carries the exact brute-force cosine
    lsh.foreach { case (q, n, c) => assert(brute((q, n)) == c) }
  }

  test("int8 quantization: exact values, zero-vector guard, error bound") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),                 // all-zero: guard path
      (3L, Array(-2.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
      Similarity.quantizeInt8(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(127L, -64L, 32L, 0L)) // round(63.5)=64 away from 0
    assert(out(2L) == Seq(0L, 0L))
    assert(out(3L) == Seq(-127L, 64L))
    // symmetric-quantization error bound: |x - q*scale/127| <= scale/254
    out.foreach { case (id, q) =>
      val emb = Map(1L -> Seq(1.0f, -0.5f, 0.25f, 0.0f), 2L -> Seq(0.0f, 0.0f),
        3L -> Seq(-2.0f, 1.0f))(id)
      val scale = emb.map(x => math.abs(x.toDouble)).max
      emb.zip(q).foreach { case (x, qi) =>
        val recon = if (scale == 0) 0.0 else qi * scale / 127
        assert(math.abs(x - recon) <= scale / 254 + 1e-9, s"vec $id comp $x")
      }
      assert(q.forall(v => v >= -127 && v <= 127))
    }
  }

  test("hard negatives: different-label only, ranked, margin splits separable queries") {
    // label 0: 1≈2 (positives); label 1: 3 leans toward 1 (the hard
    // negative), 4 orthogonal; label 2: 5 leans toward 4 (makes query 4
    // NON-separable: its hardest negative beats its one positive)
    val vs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Seq(0.8f, 0.6f, 0.0f, 0.0f), 1),
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (5L, Seq(0.0f, 0.95f, 0.3f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vs, col("vec_id").isin(1L, 4L), 3)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(2)) -> r).toMap
    // query 1: negatives are 3 (cos .8), then the 4/5 tie broken by id
    assert(Seq(1L, 2L, 3L).map(k => rows((1L, k)).getLong(3)) == Seq(3L, 4L, 5L))
    val q1 = rows((1L, 1L))
    assert(q1.getLong(6) == 1L, "one positive (vec 2)")
    assert(q1.getLong(8) == 800000L, "hardest negative is vec 3 at cos 0.8")
    assert(q1.getBoolean(10), "query 1 separable: mean positive ~.994 > .8")
    assert(out.filter(col("query_label") === col("neighbor_label")).count() == 0)
    // query 4: positive 3 at cos .6, hardest negative 5 at cos ~.954
    val q4 = rows((4L, 1L))
    assert(q4.getLong(3) == 5L && q4.getLong(9) < 0L && !q4.getBoolean(10),
      "query 4 not separable: hard negative beats its positive")
    // the query side broadcasts; the corpus is never shuffled pre-score
    assert(out.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("bitext mining: mutual-best gate, ratio margin rewards isolated matches") {
    import graft.llm.Bitext
    // A = {1, 2}, B = {101, 102, 103}. b101 is the close match for BOTH
    // a-vectors, but a1 is strictly closer — so (a1, b101) is mutual and
    // (a2, b101) is forward-only and must be rejected despite its cosine.
    val vs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (101L, Seq(0.95f, 0.05f, 0.0f, 0.0f), 0),
      (102L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (103L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Bitext.mine(vs, col("vec_id") < 100L, k = 2,
      marginThresholdPpm = 1040000L)
      .orderBy("a_id").collect()
    assert(out.length == 2, "one row per a-side vector")
    val Array(r1, r2) = out
    assert(r1.getLong(1) == 101L && r2.getLong(1) == 101L,
      "both forward-bests point at b101")
    assert(r1.getBoolean(6) && r1.getBoolean(7),
      "(a1, b101) is mutual and clears the ratio margin")
    assert(!r2.getBoolean(6) && !r2.getBoolean(7),
      "(a2, b101) is forward-only: rejected")
    assert(r1.getLong(5) > 1000000L,
      "margin > 1: the best beats its neighborhood mean (a zero-cos " +
        "second neighbor drags the denominator down)")
  }
}
