package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{BloomFileIndex, GraftTable, Manifest}

/** The unified read path: a plain `spark.table(...)` over a
  * manifest-registered catalog table gets snapshot isolation, partition
  * pruning, and bloom file pruning in ONE resolution — no library-call
  * choice, no stale-read window. */
class GraftTableSpec extends SparkTestBase {
  import spark.implicits._

  /** Physical files the planned scan would actually open. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: FileSourceScanExec =>
        s.selectedPartitions.toPartitionArray
          .map(f => f.filePath.toPath.toUri.getPath)
      case _ => Nil
    }.toSet

  private def mkTable(): (String, String) = {
    val base = Files.createTempDirectory("graft_unified").toString
    val root = s"$base/t"
    // 2 days × 3 visitor-clustered files each: uid u<NN> lives in file
    // NN%3 of each day, so a point lookup should open 2 of 6 files
    for (d <- Seq("d1", "d2"); b <- 0 until 3) {
      (0 until 30).filter(_ % 3 == b)
        .map(i => (s"u$i", s"$d-u$i-payload", d))
        .toDF("uid", "payload", "day").coalesce(1)
        .write.mode("append").partitionBy("day").parquet(root)
    }
    Manifest.bootstrap(spark, root)
    val idx = s"$base/bloom_idx"
    BloomFileIndex.build(spark, root, "uid", idx, 1000L, 10000L)
    GraftTable.register(spark, "graft_test", "unified", root,
      Some("uid"), Some(idx))
    (root, idx)
  }

  test("snapshot isolation: the table reads the COMMITTED manifest, not " +
    "the directory — staged debris is invisible; a commit flips the " +
    "NEXT query atomically") {
    val (root, _) = mkTable()
    val before = spark.table("graft_test.unified").count()
    assert(before == 60)
    // foreign/staged rows land physically but uncommitted
    Seq(("ghost", "x", "d1")).toDF("uid", "payload", "day").coalesce(1)
      .write.mode("append").partitionBy("day").parquet(root)
    assert(spark.table("graft_test.unified").count() == 60,
      "uncommitted file must be invisible to the unified table")
    assert(spark.table("graft_test.unified")
      .where(col("uid") === "ghost").count() == 0)
    // commit the full listing -> the next resolution sees version 2
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Manifest.commit(spark, root,
      Manifest.listDataFiles(fs, new org.apache.hadoop.fs.Path(root)))
    assert(spark.table("graft_test.unified").count() == 61)
    // FAIL-OPEN: the bloom index has no row yet for the just-committed
    // file, so the lookup must still find the ghost (a stale derived
    // index may cost reads, never rows) ...
    val ghostQ = spark.table("graft_test.unified")
      .where(col("uid") === "ghost")
    assert(ghostQ.count() == 1,
      "stale bloom index must not hide committed rows")
    // ... and after the index refresh the same lookup prunes tight
    val (root2, idx2) = (root, s"${new java.io.File(root).getParent}/bloom_idx")
    BloomFileIndex.refresh(spark, root2, "uid", idx2, 1000L, 10000L)
    val ghostQ2 = spark.table("graft_test.unified")
      .where(col("uid") === "ghost")
    assert(ghostQ2.count() == 1)
    assert(scannedFiles(ghostQ2).size == 1,
      "refreshed index must prune the point lookup to the one file")
  }

  test("partition + bloom pruning compose in one plan, and the scanned " +
    "file set EQUALS the bloom index's prediction restricted to the " +
    "pruned partition") {
    val (root, idx) = mkTable()
    val q = spark.table("graft_test.unified")
      .where(col("day") === "d1" && col("uid") === "u7")
    // correctness first: pruned read == full-scan filter
    assert(q.select("payload").as[String].collect().toSeq ==
      Seq("d1-u7-payload"))
    val opened = scannedFiles(q)
    val all = Manifest.current(spark, root).get._2
    assert(all.size == 6)
    // the bloom index's own prediction for u7, restricted to day=d1
    val (cand, total) = BloomFileIndex.prunedPaths(spark, idx, lit("u7"))
    assert(total == 6)
    val expected = cand.map(BloomFileIndex.norm)
      .filter(_.contains("day=d1")).toSet
    assert(opened == expected,
      s"scan must open exactly the bloom candidates in the partition: " +
        s"opened=$opened expected=$expected")
    assert(opened.size < 3,
      s"bloom must prune within the partition: ${opened.size} of 3")
    assert(opened.forall(_.contains("day=d1")),
      "partition pruning must hold alongside bloom pruning")
  }

  test("colstats RANGE pruning inside the unified table: a range " +
    "predicate opens only min/max-intersecting files once the sidecar " +
    "exists; without it the read fails OPEN (all files, right answer)") {
    val base = Files.createTempDirectory("graft_unified_rng").toString
    val root = s"$base/t"
    spark.range(400).select(col("id"), (col("id") * 10).as("v"))
      .repartitionByRange(4, col("id"))
      .write.parquet(root)
    Manifest.bootstrap(spark, root)
    GraftTable.register(spark, "graft_test", "ranged", root)
    def q() = spark.table("graft_test.ranged")
      .where(col("id") >= 150L && col("id") <= 160L)
    // no colstats sidecar yet: fail open — correct answer, full scan
    assert(q().count() == 11)
    assert(scannedFiles(q()).size == 4, "no sidecar -> no pruning")
    // sidecar written for the SAME committed version: the next
    // resolution prunes from the log, zero data IO to decide
    Manifest.writeColStats(spark, root, 1L, Seq("id"))
    assert(q().count() == 11, "pruning must lose nothing")
    val opened = scannedFiles(q())
    assert(opened.nonEmpty && opened.size < 4,
      s"range must prune files: ${opened.size} of 4")
    // a disjoint range opens nothing at all
    val none = spark.table("graft_test.ranged")
      .where(col("id") >= 5000L && col("id") < 6000L)
    assert(none.count() == 0)
    assert(scannedFiles(none).isEmpty, "disjoint range must prune all files")
  }

  test("no bloom predicate -> partition pruning only; no partition " +
    "predicate -> bloom-only pruning across all partitions") {
    val (root, idx) = mkTable()
    val dayOnly = spark.table("graft_test.unified").where(col("day") === "d2")
    assert(dayOnly.count() == 30)
    val openedDay = scannedFiles(dayOnly)
    assert(openedDay.size == 3 && openedDay.forall(_.contains("day=d2")))
    val uidOnly = spark.table("graft_test.unified").where(col("uid") === "u11")
    assert(uidOnly.count() == 2, "u11 exists on both days")
    val openedUid = scannedFiles(uidOnly)
    val (cand, _) = BloomFileIndex.prunedPaths(spark, idx, lit("u11"))
    assert(openedUid == cand.map(BloomFileIndex.norm).toSet)
    assert(openedUid.size < 6, "bloom must prune an unpartitioned lookup")
  }
}
