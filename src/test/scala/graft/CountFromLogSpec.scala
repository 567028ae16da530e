package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, Manifest}

/** Metadata-only COUNT: a global `count(*)` (optionally under
  * partition-column filters) over a manifest table must collapse to a
  * LocalRelation fed by the commit log's row-count sidecar — zero file
  * scans — and must DECLINE (normal scan, correct answer) whenever
  * exactness isn't provable: data-column predicates, count(col),
  * grouped counts, absent stats. */
class CountFromLogSpec extends SparkTestBase {
  import spark.implicits._

  /** Relation count in the OPTIMIZED plan — AQE-proof (the physical
    * AdaptiveSparkPlanExec hides its children from collect): 0 means
    * the rule collapsed every scan to a LocalRelation. */
  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size

  /** day-partitioned table: d1 has 12 rows, d2 has 30. */
  private def mkTable(writeStats: Boolean = true): (String, String) = {
    val base = Files.createTempDirectory("graft_countlog").toString
    val root = s"$base/t"
    val name = s"cfl_${Integer.toHexString(root.hashCode)}"
    ((0 until 12).map(i => (s"u$i", "d1")) ++
      (0 until 30).map(i => (s"v$i", "d2")))
      .toDF("uid", "day").repartition(3)
      .write.partitionBy("day").parquet(root)
    Manifest.bootstrap(spark, root)
    if (writeStats) Manifest.writeStats(spark, root, 1L)
    GraftTable.register(spark, "graft_test", name, root)
    (root, s"graft_test.$name")
  }

  test("global count answers from the log with zero file scans") {
    val (_, t) = mkTable()
    val agg = spark.table(t).groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 0, "count(*) must not plan a file scan")
    assert(agg.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(spark.table(t).count() == 42L) // Dataset.count() takes the same path
  }

  test("partition-filtered count prunes through the file index, still zero IO") {
    val (_, t) = mkTable()
    val agg = spark.table(t).where(col("day") === "d2")
      .groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 0)
    assert(agg.collect().head.getLong(0) == 30L)
    val sql = spark.sql(s"SELECT count(*) AS n, count(1) AS m FROM $t " +
      "WHERE day = 'd1'")
    assert(scans(sql) == 0)
    assert(sql.collect().head == org.apache.spark.sql.Row(12L, 12L))
  }

  test("data-column predicate declines the rewrite — scan, correct answer") {
    val (_, t) = mkTable()
    val agg = spark.table(t).where(col("uid") === "u3")
      .groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 1, "row-level truth needs the scan")
    assert(agg.collect().head.getLong(0) == 1L)
  }

  test("count(col) and grouped counts decline (null-sensitive / per-group)") {
    val (_, t) = mkTable()
    val colCount = spark.table(t).agg(count(col("uid")).as("n"))
    assert(scans(colCount) == 1)
    assert(colCount.collect().head.getLong(0) == 42L)
    val grouped = spark.table(t).groupBy("day").agg(count(lit(1)).as("n"))
    assert(scans(grouped) == 1)
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("d1" -> 12L, "d2" -> 30L))
  }

  test("no stats sidecar -> declines, never guesses") {
    val (_, t) = mkTable(writeStats = false)
    val agg = spark.table(t).groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 1)
    assert(agg.collect().head.getLong(0) == 42L)
  }

  test("a wiped and re-bootstrapped root never serves a stale cached index") {
    val (root, t) = mkTable()
    assert(spark.table(t).count() == 42L)
    // overwrite wipes the tree INCLUDING the manifest dir -> fresh v1
    // over different uuid part files, same version number: the index
    // cache must miss (file-list fingerprint), not replay dead paths
    (0 until 5).map(i => (s"x$i", "d1")).toDF("uid", "day").repartition(2)
      .write.mode("overwrite").partitionBy("day").parquet(root)
    Manifest.bootstrap(spark, root)
    Manifest.writeStats(spark, root, 1L)
    val agg = spark.table(t).groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 0)
    assert(agg.collect().head.getLong(0) == 5L)
  }

  test("a new commit + stats moves the answer with the snapshot") {
    val (root, t) = mkTable()
    // replace d1 (12 rows) with a 14-row version through the CAS path
    // (materialized first — the stage writes into the tree it reads)
    val cur = spark.table(t).where(col("day") === "d1")
      .select("uid").as[String].collect().toSeq
    val add = (cur ++ Seq("w1", "w2")).map((_, "d1")).toDF("uid", "day")
    Manifest.commitPartitionReplacementCas(spark, root, "day", add,
      touched = Seq("d1"))
    Manifest.writeStats(spark, root,
      Manifest.current(spark, root).get._1)
    val agg = spark.table(t).groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 0)
    assert(agg.collect().head.getLong(0) == 44L)
  }
}
