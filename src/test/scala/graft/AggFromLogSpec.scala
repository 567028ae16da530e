package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, Manifest}

/** Metadata-only aggregates: a global count(*)/count(col)/min/max
  * (optionally under partition-column filters) over a manifest table
  * must collapse to a LocalRelation folded from the commit log's
  * stats sidecars — zero file scans — and must DECLINE (normal scan,
  * correct answer) whenever exactness isn't provable: data-column
  * predicates, grouped aggregates, distinct, absent stats, renamed
  * columns. */
class AggFromLogSpec extends SparkTestBase {
  import spark.implicits._

  /** Relation count in the OPTIMIZED plan — AQE-proof (the physical
    * AdaptiveSparkPlanExec hides its children from collect): 0 means
    * the rule collapsed every scan to a LocalRelation. */
  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size

  /** day-partitioned table: d1 has 12 rows, d2 has 30; `score` is null
    * on every third row (14 nulls total, 4 in d1). */
  private def mkTable(writeStats: Boolean = true,
                      writeColStats: Boolean = false): (String, String) = {
    val base = Files.createTempDirectory("graft_agglog").toString
    val root = s"$base/t"
    val name = s"afl_${Integer.toHexString(root.hashCode)}"
    def rows(n: Int, p: String, d: String) = (0 until n).map(i =>
      (s"$p$i", if (i % 3 == 0) None else Some(i * 10L), d))
    (rows(12, "u", "d1") ++ rows(30, "v", "d2"))
      .toDF("uid", "score", "day").repartition(3)
      .write.partitionBy("day").parquet(root)
    Manifest.bootstrap(spark, root)
    if (writeStats) Manifest.writeStats(spark, root, 1L)
    if (writeColStats)
      Manifest.writeColStats(spark, root, 1L, Seq("uid", "score"))
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

  test("min/max/count(col) fold from colstats — zero IO, null-exact") {
    val (root, t) = mkTable(writeColStats = true)
    val agg = spark.table(t).groupBy().agg(
      min(col("uid")).as("mn_uid"), max(col("uid")).as("mx_uid"),
      min(col("score")).as("mn_s"), max(col("score")).as("mx_s"),
      count(col("score")).as("n_s"), count(lit(1)).as("n"))
    assert(scans(agg) == 0, "colstats-covered aggregates must not scan")
    val truth = spark.read.parquet(root).groupBy().agg(
      min(col("uid")), max(col("uid")), min(col("score")),
      max(col("score")), count(col("score")), count(lit(1))).collect().head
    assert(agg.collect().head == truth)
    // and under a partition filter
    val part = spark.table(t).where(col("day") === "d1").groupBy().agg(
      max(col("score")).as("mx"), count(col("score")).as("n_s"))
    assert(scans(part) == 0)
    assert(part.collect().head == org.apache.spark.sql.Row(110L, 8L))
  }

  test("sum(col) folds exactly from per-file sums — nulls out, wrap-consistent") {
    val (root, t) = mkTable(writeColStats = true)
    val agg = spark.table(t).groupBy().agg(sum(col("score")).as("s"),
      count(col("score")).as("n_s"))
    assert(scans(agg) == 0, "integral sum must fold from the sidecar")
    val truth = spark.read.parquet(root).groupBy()
      .agg(sum(col("score")), count(col("score"))).collect().head
    assert(agg.collect().head == truth)
    // partition-filtered arm: d1 non-null scores are 10..110 skipping %3==0
    val part = spark.table(t).where(col("day") === "d1")
      .agg(sum(col("score")).as("s"))
    assert(scans(part) == 0)
    val partTruth = spark.read.parquet(root).where(col("day") === "d1")
      .agg(sum(col("score"))).collect().head
    assert(part.collect().head == partTruth)
    // double sums DECLINE (per-file-then-fold reassociates)
    val dbl = spark.table(t).agg(sum(col("score").cast("double")).as("s"))
    assert(scans(dbl) == 1)
  }

  test("count(*) falls back to colstats n_rows when the stats sidecar is absent") {
    val (_, t) = mkTable(writeStats = false, writeColStats = true)
    val agg = spark.table(t).groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 0)
    assert(agg.collect().head.getLong(0) == 42L)
  }

  test("data-column predicate declines the rewrite — scan, correct answer") {
    val (_, t) = mkTable(writeColStats = true)
    val agg = spark.table(t).where(col("uid") === "u3")
      .groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 1, "row-level truth needs the scan")
    assert(agg.collect().head.getLong(0) == 1L)
  }

  test("declines: min/max without colstats, grouped counts, renamed columns") {
    val (_, t) = mkTable() // row-count stats only
    val noCol = spark.table(t).agg(min(col("uid")).as("mn"))
    assert(scans(noCol) == 1)
    assert(noCol.collect().head.getString(0) == "u0")
    val grouped = spark.table(t).groupBy("day").agg(count(lit(1)).as("n"))
    assert(scans(grouped) == 1)
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("d1" -> 12L, "d2" -> 30L))
    // a rename that collides with a real sidecar column name must not
    // fold the wrong stats (Project passthrough is bare-attrs only)
    val (_, t2) = mkTable(writeColStats = true)
    val renamed = spark.table(t2).select(col("score").as("uid"))
      .agg(max(col("uid")).as("mx"))
    assert(scans(renamed) == 1)
    assert(renamed.collect().head.getLong(0) == 290L)
  }

  test("no stats sidecar at all -> declines, never guesses") {
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
    (0 until 5).map(i => (s"x$i", Some(i.toLong), "d1"))
      .toDF("uid", "score", "day").repartition(2)
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
      .select("uid", "score").as[(String, Option[Long])].collect().toSeq
    val add = (cur ++ Seq(("w1", Some(1L)), ("w2", Some(2L))))
      .map { case (u, sc) => (u, sc, "d1") }.toDF("uid", "score", "day")
    Manifest.commitPartitionReplacementCas(spark, root, "day", add,
      touched = Seq("d1"))
    Manifest.writeStats(spark, root,
      Manifest.current(spark, root).get._1)
    val agg = spark.table(t).groupBy().agg(count(lit(1)).as("n"))
    assert(scans(agg) == 0)
    assert(agg.collect().head.getLong(0) == 44L)
  }
}
