package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Persistent IVF-Flat index artifact — build ONCE, query MANY: the
  * production lifecycle the per-query arms (q35/q147/q161 fit their
  * quantizer inside the query) deliberately inline for oracle
  * replayability, but which a 100 TB deployment runs as an artifact:
  *
  *   <root>/_CURRENT                    pointer ([[Versioned]])
  *   <root>/v=NNNNNNNN/centroids/       (cell, centroid) — k·dims rows
  *   <root>/v=NNNNNNNN/assignments/     cell=N/ (vec_id, embedding)
  *   <root>/v=NNNNNNNN/_meta            build-time constants (store, quantized)
  *
  * The assignments tree IS the inverted-list layout (faiss IVF-Flat):
  * each vector's row — id AND embedding — lives under its cell's
  * partition directory, so a query probing `nProbe` cells reads ONLY
  * those directories (PartitionFilters, spec-asserted) and reranks
  * without any join back to the corpus. Centroids are the usual
  * bounded k·dims driver collect (the IVF codebook contract).
  *
  * Lifecycle:
  *  - [[build]] fits the deterministic k-means quantizer and publishes
  *    a new immutable version (reader-safe pointer swap; a rebuild is
  *    the re-cluster cadence for distribution drift);
  *  - [[append]] admits a NEW batch into the CURRENT version by
  *    assigning it to the existing centroids — one map-side pass +
  *    an additive write of new files into the touched cell partitions
  *    (readers planning after the append see the new vectors; the
  *    centroids themselves only move on the next [[build]]);
  *  - [[query]] = probe `nProbe` closest cells per query vector, scan
  *    exactly those partitions, exact-cosine rerank — bit-equal to
  *    [[Similarity.ivfTopKWith]] on the same centroids (spec-gated).
  */
object VectorIndex {

  /** Fit + publish a new index version over `vecs` (vec_id, embedding).
    *
    * `quantized = true` stores the inverted lists as symmetric-int8
    * codes ([[Similarity.quantizeInt8]] cast to bytes) instead of
    * float32 — 4× smaller lists in memory/shuffle, the compression
    * that lets a 100 TB vector corpus scan from memory. Per-vector
    * scale is deliberately NOT stored: cosine is scale-invariant, so
    * the code's DIRECTION is all ranking needs; the cost is the int8
    * rounding of that direction, and [[query]] against a quantized
    * version is therefore approximate (recall spec-gated on the
    * clustered fixture, exact on well-separated data). */
  def build(spark: SparkSession, vecs: DataFrame, root: String,
            kCells: Int = Similarity.IvfKmeansCells,
            iters: Int = Similarity.IvfKmeansIters,
            store: Int = Similarity.IvfSelStore,
            quantized: Boolean = false): Unit = {
    require(store >= 1, s"store must be >= 1: $store")
    val cents = KMeans.fitCentroids(vecs, kCells, iters)
    val cur = Versioned.current(spark, root)
    val next = Versioned.nextName(cur)
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("cell", "centroid")
      .coalesce(1) // k·dims doubles: one model-artifact file
      .write.mode("overwrite").parquet(s"$root/$next/centroids")
    assignRows(vecs, cents, store, quantized)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/$next/assignments")
    // build-time constants travel WITH the version: append must reuse
    // the exact store/quantized the lists were written under, and
    // deriving them from the data itself is both O(index) per append
    // and wrong under a retried (duplicated) append batch
    writeMeta(spark, s"$root/$next/_meta", store, quantized)
    Versioned.publish(spark, root, next, cur)
  }

  /** Admit a new vector batch into the current version: assign to the
    * EXISTING centroids, additive write into the touched cell
    * partitions (no version swap — see the lifecycle note above).
    *
    * Concurrency contract: builds and appends are ONE writer at a time
    * (the caller serializes them — e.g. the foreachBatch loop that owns
    * the index). A [[build]] that PUBLISHES while an append is writing
    * would strand the batch in the superseded version; the post-write
    * pointer check below turns that near-miss into a loud failure so
    * an at-least-once caller re-appends into the new version. */
  def append(spark: SparkSession, vecs: DataFrame, root: String): Unit = {
    val (v, cents) = centroids(spark, root)
    if (cents.isEmpty) return // empty index: nothing to assign against
    val (store, quantized) = readMeta(spark, s"$root/$v/_meta")
    assignRows(vecs, cents, store, quantized)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/$v/assignments")
    val after = Versioned.current(spark, root)
    require(after.contains(v),
      s"index version changed during append ($v -> ${after.orNull}): " +
        "the batch landed in the superseded version — re-append it")
  }

  /** Top-k per query vector in `queries` (vec_id, embedding), probing
    * `nProbe` cells: partition-pruned scan of exactly the probed
    * cells' inverted lists + exact cosine rerank. */
  def query(spark: SparkSession, queries: DataFrame, root: String,
            k: Int, nProbe: Int = Similarity.IvfSelProbe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (v, cents) = centroids(spark, root)
    if (cents.isEmpty)
      return queries.select(col("vec_id").as("query_id"),
        col("vec_id").as("neighbor_id"), lit(0L).as("rank"),
        lit(0.0).as("cosine")).where(lit(false))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(Similarity.topCells(col("embedding"), cents, nProbe)).as("cell"))
    // probed cells: bounded by min(kCells, queries·nProbe) — the
    // driver-side partition list that makes the scan PRUNE (a join on
    // the partition column alone would read every cell directory)
    val probed = q.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val lists0 = spark.read.parquet(s"$root/$v/assignments")
      .filter(col("cell").cast("string").isin(probed: _*))
    // a quantized version scores against the int8 DIRECTION (cosine is
    // scale-invariant; the full-precision query keeps its own side exact)
    val lists =
      if (lists0.schema.fieldNames.contains("q8"))
        lists0.withColumn("embedding",
          transform(col("q8"), _.cast("double"))).drop("q8")
      else lists0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val cand = lists
      .withColumn("cell", col("cell").cast("int"))
      .join(broadcast(q.withColumn("cell", col("cell").cast("int"))), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.cosineD(col("qe"), col("embedding")), 6).as("cosine"))
    // store > 1 duplicates a pair across shared probed cells
    cand.distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** The current version's centroid matrix (cell order) — bounded
    * k·dims collect, the IVF codebook contract. */
  def centroids(spark: SparkSession, root: String): (String, Seq[Seq[Double]]) =
    Versioned.current(spark, root) match {
      case None => ("", Seq.empty)
      case Some(v) =>
        val cents = spark.read.parquet(s"$root/$v/centroids")
          .orderBy("cell").collect()
          .map(_.getSeq[Double](1).toSeq).toSeq
        (v, cents)
    }

  private def assignRows(vecs: DataFrame, cents: Seq[Seq[Double]],
                         store: Int, quantized: Boolean = false): DataFrame = {
    val payload =
      if (quantized)
        transform(Similarity.quantizeInt8(col("embedding")),
          _.cast("byte")).as("q8")
      else col("embedding")
    vecs.select(col("vec_id"), payload,
      explode(Similarity.topCells(col("embedding"), cents, store)).as("cell"))
  }

  /** Build-time constants of a version, as a tiny `_meta` text file
    * (`store=N`/`quantized=B` lines) — Hadoop-FS IO so the artifact
    * works on s3a/hdfs roots like the trees it describes. */
  private def writeMeta(spark: SparkSession, path: String,
                        store: Int, quantized: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"store=$store\nquantized=$quantized\n".getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String): (Int, Boolean) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"index version is missing its _meta file: $path")
    val in = fs.open(p)
    val text = try {
      val buf = new Array[Byte](256)
      var n = 0
      var r = in.read(buf, 0, buf.length)
      while (r > 0) { n += r; r = in.read(buf, n, buf.length - n) }
      new String(buf, 0, n, "UTF-8")
    } finally in.close()
    val kv = text.linesIterator.map(_.trim).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    (kv("store").toInt, kv("quantized").toBoolean)
  }
}
