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
