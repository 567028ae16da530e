package graft

import org.apache.spark.sql.functions._

import graft.llm.{KMeans, Similarity, VectorIndex}

class VectorIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = graft.sources.Tables.embeddings(spark, sf)

  test("build once, query many: index query bit-equal to the inline IVF; " +
    "probed-cell scan partition-prunes") {
    val root = java.nio.file.Files.createTempDirectory("vidx").toString + "/index"
    VectorIndex.build(spark, vecs, root)
    val queries = vecs.filter(col("vec_id") < 10)
    val fromIndex = VectorIndex.query(spark, queries, root, k = 5)
    // the same centroids the build fit (deterministic k-means), queried
    // through the inline operator, must match the artifact path exactly
    val cents = KMeans.fitCentroids(vecs,
      Similarity.IvfKmeansCells, Similarity.IvfKmeansIters)
    val inline = Similarity.ivfTopKWith(vecs, cents, col("vec_id") < 10,
      5, Similarity.IvfSelProbe, Similarity.IvfSelStore)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    assert(rows(fromIndex) == rows(inline))
    assert(rows(fromIndex).nonEmpty)
    // the inverted-list scan reads ONLY probed cell partitions: the
    // assignments FileScan line must carry a non-empty PartitionFilters
    // (the corpus scans in the same plan are unpartitioned — assert on
    // the assignments line, not plan-wide)
    val plan = fromIndex.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("assignments") && l.contains("FileScan"))
    assert(scanLine.exists(l =>
      l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []")),
      s"assignments scan must partition-prune:\n$plan")
  }

  test("append admits new vectors without a rebuild: a clone's query " +
    "finds it at rank 1, cosine 1.0") {
    val root = java.nio.file.Files.createTempDirectory("vidx_ap").toString + "/index"
    VectorIndex.build(spark, vecs, root)
    val before = spark.read.parquet(
      s"$root/${VectorIndex.centroids(spark, root)._1}/assignments").count()
    // clones of the first 10 vectors under new ids
    val clones = vecs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    VectorIndex.append(spark, clones, root)
    val after = spark.read.parquet(
      s"$root/${VectorIndex.centroids(spark, root)._1}/assignments").count()
    assert(after == before + 10)
    // each original query's nearest neighbor is now its own clone
    val top1 = VectorIndex.query(spark,
      vecs.filter(col("vec_id") < 10), root, k = 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(top1.length == 10)
    top1.foreach { case (q, n, r, cos) =>
      assert(r == 1L && n == q + 10000L && cos == 1.0,
        s"query $q: expected clone ${q + 10000} at cosine 1.0, got $n @ $cos")
    }
  }

  test("quantized lists: int8 codes stored, in-cluster recall >= 0.9 vs " +
    "the exact index, append inherits the encoding") {
    val clustered = graft.llm.Similarity.plantedClusters(vecs).persist()
    try {
      val rootF = java.nio.file.Files.createTempDirectory("vidx_f").toString + "/i"
      val rootQ = java.nio.file.Files.createTempDirectory("vidx_q").toString + "/i"
      VectorIndex.build(spark, clustered, rootF)
      VectorIndex.build(spark, clustered, rootQ, quantized = true)
      // the stored payload really is bytes
      val v = VectorIndex.centroids(spark, rootQ)._1
      val schema = spark.read.parquet(s"$rootQ/$v/assignments").schema
      assert(schema("q8").dataType.asInstanceOf[
        org.apache.spark.sql.types.ArrayType].elementType ==
        org.apache.spark.sql.types.ByteType)
      val queries = clustered.filter(col("vec_id") < 10)
      def top5(root: String) =
        VectorIndex.query(spark, queries, root, k = 5)
          .select("query_id", "neighbor_id")
          .as[(Long, Long)].collect().toSet
      val exact = top5(rootF)
      val quant = top5(rootQ)
      // the cluster gap dwarfs the int8 rounding, so every retrieved
      // neighbor stays IN-cluster; what rounding can flip is the
      // ordering among near-tied within-cluster cosines at the rank-5
      // boundary (measured: 48/50 on this fixture) — gate at the
      // q147/q161 acceptance threshold
      val recall = (exact & quant).size.toDouble / exact.size
      assert(recall >= 0.9, s"quantized recall $recall: lost " +
        s"${(exact -- quant).size} of ${exact.size} neighbors")
      // and no retrieved neighbor ever leaves the query's cluster
      assert(quant.forall { case (q, n) => n % 10 == q })
      // append into a quantized version keeps the encoding
      val clones = clustered.filter(col("vec_id") < 2)
        .select((col("vec_id") + 30000L).as("vec_id"), col("embedding"))
      VectorIndex.append(spark, clones, rootQ)
      val t1 = VectorIndex.query(spark,
        clustered.filter(col("vec_id") < 2), rootQ, k = 1)
        .as[(Long, Long, Long, Double)].collect()
      // vs the int8 code of its own clone: rank 1 at cosine ≈ 1 (the
      // rounding costs a few 1e-5, exactly the approximation on offer)
      assert(t1.forall { case (q, n, _, cos) => n == q + 30000L && cos > 0.999 },
        t1.mkString(";"))
    } finally clustered.unpersist()
  }

  test("streaming maintenance: a vector stream drains into the index " +
    "via foreachBatch append; queries see each batch as it lands") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("vidx_st").toString + "/index"
    val ckpt = java.nio.file.Files.createTempDirectory("vidx_stck").toString
    VectorIndex.build(spark, vecs, root)
    val dims = vecs.select(size(col("embedding"))).first().getInt(0)
    val base = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) VectorIndex.append(spark, batch, root)
      }.start()
    try {
      input.addData(base.take(2).map { case (id, e) => (id + 20000L, e) }: _*)
      q.processAllAvailable()
      val t1 = VectorIndex.query(spark, vecs.filter(col("vec_id") < 2), root, 1)
        .as[(Long, Long, Long, Double)].collect()
      assert(t1.forall { case (qid, n, _, cos) => n == qid + 20000L && cos == 1.0 })
      input.addData(base.drop(2).map { case (id, e) => (id + 20000L, e) }: _*)
      q.processAllAvailable()
      val t2 = VectorIndex.query(spark, vecs.filter(col("vec_id") < 4), root, 1)
        .as[(Long, Long, Long, Double)].collect()
      assert(t2.length == 4)
      assert(t2.forall { case (qid, n, _, cos) => n == qid + 20000L && cos == 1.0 })
      assert(dims == 64) // fixture sanity: the clones carried real vectors
    } finally q.stop()
  }

  test("rebuild publishes a new version; empty index queries empty") {
    val root = java.nio.file.Files.createTempDirectory("vidx_rv").toString + "/index"
    assert(VectorIndex.query(spark, vecs.limit(1), root, k = 5).isEmpty)
    VectorIndex.build(spark, vecs, root)
    assert(VectorIndex.centroids(spark, root)._1 == "v=00000000")
    VectorIndex.build(spark, vecs, root)
    assert(VectorIndex.centroids(spark, root)._1 == "v=00000001")
    // superseded version kept one generation (the Versioned contract)
    assert(new java.io.File(s"$root/v=00000000").exists())
    VectorIndex.build(spark, vecs, root)
    assert(!new java.io.File(s"$root/v=00000000").exists())
  }
}
