package graft

import org.apache.spark.sql.functions._
import graft.sources.SkippingIndex

class SkippingIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val tmp = System.getProperty("java.io.tmpdir")

  test("clustered layout: narrow predicate prunes files, result equals full scan") {
    val layout = s"$tmp/graft_sk_spec_layout"
    val idx = s"$tmp/graft_sk_spec_idx"
    spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(8, col("o_orderdate"))
      .write.mode("overwrite").parquet(layout)
    SkippingIndex.build(spark, layout, Seq("o_orderdate", "o_totalprice"), idx)

    val lo = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val (paths, total) = SkippingIndex.prunedPaths(spark, idx, "o_orderdate", lo, hi)
    assert(total == 8, s"8 range files expected, got $total")
    assert(paths.nonEmpty && paths.length < total,
      s"a 3-month window over a range layout must prune: kept ${paths.length}/$total")

    val pruned = SkippingIndex.scan(spark, layout, paths)
      .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      .select("o_orderkey").as[Long].collect().sorted
    val full = spark.read.parquet(layout)
      .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      .select("o_orderkey").as[Long].collect().sorted
    assert(pruned.sameElements(full), "pruning must lose nothing")
  }

  test("unclustered (hash) layout keeps every file — skipping needs clustering") {
    val layout = s"$tmp/graft_sk_spec_hash"
    val idx = s"$tmp/graft_sk_spec_hash_idx"
    spark.read.parquet(s"$sf/orders.parquet")
      .repartition(8, col("o_orderkey")) // scatters dates across files
      .write.mode("overwrite").parquet(layout)
    SkippingIndex.build(spark, layout, Seq("o_orderdate"), idx)
    val (paths, total) = SkippingIndex.prunedPaths(spark, idx, "o_orderdate",
      java.sql.Timestamp.valueOf("1995-03-01 00:00:00"),
      java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))
    assert(paths.length.toLong == total,
      "every file spans the full range: nothing prunes")
  }

  test("refresh stats only unseen files; carried rows byte-identical; dropped files leave") {
    val layout = s"$tmp/graft_sk_spec_inc"
    val idx = s"$tmp/graft_sk_spec_inc_idx"
    (1L to 100L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(layout)
    SkippingIndex.build(spark, layout, Seq("v"), idx)
    val before = spark.read.parquet(idx).collect()
    assert(before.length == 1)
    // append a second file; refresh must keep the old row verbatim
    (101L to 200L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(layout)
    SkippingIndex.refresh(spark, layout, Seq("v"), idx)
    val after = spark.read.parquet(idx).collect().sortBy(_.getAs[Long]("n_rows"))
    assert(after.length == 2)
    assert(after.exists(_.toSeq == before.head.toSeq), "old row carried verbatim")
    val (paths, total) = SkippingIndex.prunedPaths(spark, idx, "v", 1500L, 1600L)
    assert(total == 2 && paths.length == 1, "only the new file matches [1500,1600]")
    // no-op refresh: same two rows
    SkippingIndex.refresh(spark, layout, Seq("v"), idx)
    assert(spark.read.parquet(idx).count() == 2)
    // compaction: rewrite the layout to one file — stale entries leave
    spark.read.parquet(layout).repartition(1)
      .write.mode("overwrite").parquet(s"$layout-c")
    SkippingIndex.refresh(spark, s"$layout-c", Seq("v"), idx)
    val compacted = spark.read.parquet(idx).collect()
    assert(compacted.length == 1 && compacted.head.getAs[Long]("n_rows") == 200L)
  }

  test("all-null files are skipped exactly; empty survivor set keeps the schema") {
    val layout = s"$tmp/graft_sk_spec_nulls"
    val idx = s"$tmp/graft_sk_spec_nulls_idx"
    // two files, written explicitly: one with values, one all-null
    Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(layout)
    Seq((3L, Option.empty[Long]), (4L, None)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(layout)
    SkippingIndex.build(spark, layout, Seq("v"), idx)
    val (paths, total) = SkippingIndex.prunedPaths(spark, idx, "v", 5L, 25L)
    assert(total == 2 && paths.length == 1, "the all-null file must prune")
    val got = SkippingIndex.scan(spark, layout, paths)
      .filter(col("v").between(5L, 25L)).select("id")
      .as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 2L)))
    // disjoint window: no survivors, but the frame keeps the schema
    val (none, _) = SkippingIndex.prunedPaths(spark, idx, "v", 100L, 200L)
    assert(none.isEmpty)
    val empty = SkippingIndex.scan(spark, layout, none)
    assert(empty.columns.toSeq == Seq("id", "v") && empty.count() == 0)
  }

  test("fromLog: skipping index derived from the colstats sidecar with " +
    "ZERO data-file IO — pruning parity with the scan-built index, " +
    "rebuild works with every data file hidden, and a later commit's " +
    "sidecar stats only the new files") {
    import graft.sources.Manifest
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_skiplog").toString
    val table = s"$base/t"
    spark.range(400).select(col("id"), (col("id") * 10).as("v"))
      .repartitionByRange(4, col("id"))
      .write.parquet(table)
    Manifest.bootstrap(spark, table)
    Manifest.writeColStats(spark, table, 1L, Seq("id", "v"))
    val idxLog = s"$base/idx_log"
    val idxScan = s"$base/idx_scan"
    SkippingIndex.fromLog(spark, table, Seq("id", "v"), idxLog)
    SkippingIndex.build(spark, table, Seq("id", "v"), idxScan)
    def norm(p: String) =
      p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "")
    for ((lo, hi) <- Seq((0L, 99L), (150L, 160L), (399L, 500L),
      (1000L, 2000L), (null, 50L), (380L, null))) {
      val (a, ta) = SkippingIndex.prunedPaths(spark, idxLog, "id", lo, hi)
      val (b, tb) = SkippingIndex.prunedPaths(spark, idxScan, "id", lo, hi)
      assert(a.map(norm).toSet == b.map(norm).toSet && ta == tb,
        s"[$lo,$hi]: log=${a.map(norm).toSet} scan=${b.map(norm).toSet}")
    }
    // soundness through the pruned read
    val (keep, total) = SkippingIndex.prunedPaths(spark, idxLog, "id",
      150L, 160L)
    assert(keep.nonEmpty && keep.length < total)
    val viaIdx = SkippingIndex.scan(spark, table, keep)
      .filter(col("id").between(150, 160)).agg(sum("v")).as[Long].head()
    val viaFull = spark.read.parquet(table)
      .filter(col("id").between(150, 160)).agg(sum("v")).as[Long].head()
    assert(viaIdx == viaFull)
    // ZERO-IO proof: hide EVERY data file; fromLog must still rebuild
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rootP = new org.apache.hadoop.fs.Path(table)
    val live = Manifest.listDataFiles(fs, rootP)
    live.foreach { f =>
      fs.rename(new org.apache.hadoop.fs.Path(rootP, f),
        new org.apache.hadoop.fs.Path(rootP, f + ".bak"))
    }
    SkippingIndex.fromLog(spark, table, Seq("id", "v"), s"$base/idx_log2")
    assert(spark.read.parquet(s"$base/idx_log2").count() == total)
    live.foreach { f =>
      fs.rename(new org.apache.hadoop.fs.Path(rootP, f + ".bak"),
        new org.apache.hadoop.fs.Path(rootP, f))
    }
    // carry-forward: append one new file, commit v2, writeColStats with
    // the ORIGINAL files hidden — only the never-seen file may be read
    spark.range(400, 500).select(col("id"), (col("id") * 10).as("v"))
      .coalesce(1).write.mode("append").parquet(table)
    Manifest.commit(spark, table, Manifest.listDataFiles(fs, rootP))
    live.foreach { f =>
      fs.rename(new org.apache.hadoop.fs.Path(rootP, f),
        new org.apache.hadoop.fs.Path(rootP, f + ".bak"))
    }
    Manifest.writeColStats(spark, table, 2L, Seq("id", "v"))
    live.foreach { f =>
      fs.rename(new org.apache.hadoop.fs.Path(rootP, f + ".bak"),
        new org.apache.hadoop.fs.Path(rootP, f))
    }
    SkippingIndex.fromLog(spark, table, Seq("id", "v"), idxLog)
    val (k2, t2) = SkippingIndex.prunedPaths(spark, idxLog, "id", 450L, 460L)
    assert(t2 == total + 1, s"index must cover the appended file: $t2")
    assert(k2.length == 1, s"one new file holds [450,460]: $k2")
    val s2 = SkippingIndex.scan(spark, table, k2)
      .filter(col("id").between(450, 460)).agg(sum("v")).as[Long].head()
    assert(s2 == (450L to 460L).map(_ * 10).sum)
  }
}
