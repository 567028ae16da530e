package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, Manifest}

/** SQL DML on manifest tables (round-11 verdict #3): DELETE FROM /
  * UPDATE / keyed MERGE INTO over a `graft.manifest=true` catalog
  * table dispatch to the merge-on-read operators — zero data-file
  * rewrites, deletion-vector commits, results visible to the very
  * next spark.table() read. Everything outside the operators'
  * contract falls through to Spark's own error, never a silent
  * partial write. */
class SqlDmlSpec extends SparkTestBase {
  import spark.implicits._

  private var n = 0
  /** Registered manifest table over (id, day, v), day-partitioned. */
  private def mkTable(): (String, String) = {
    n += 1
    val root = Files.createTempDirectory("graft_sqldml").toString + "/t"
    Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L), (4L, "d3", 40L))
      .toDF("id", "day", "v").repartition(2)
      .write.partitionBy("day").parquet(root)
    Manifest.bootstrap(spark, root)
    val name = s"graft_dml.t$n"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v BIGINT, day STRING")
    GraftTable.register(spark, "graft_dml", s"t$n", root,
      schema = Some(schema), partitionCols = Seq("day"))
    (root, name)
  }

  private def rows(name: String): Set[(Long, String, Long)] =
    spark.table(name)
      .select(col("id"), col("day").cast("string"), col("v"))
      .as[(Long, String, Long)].collect().toSet

  test("DELETE FROM: a deletion-vector commit — zero files rewritten, " +
    "the next spark.table() read serves base minus matches") {
    val (root, name) = mkTable()
    val before = Manifest.current(spark, root).get._2
    val res = spark.sql(s"DELETE FROM $name WHERE v >= 30")
      .as[(Long, Long)].collect().head
    assert(res == ((2L, 2L)), s"(version, rows_affected) = $res")
    assert(Manifest.current(spark, root).get._2 == before,
      "merge-on-read: the file list must be byte-identical")
    assert(Manifest.dvsAt(spark, root, 2L).nonEmpty)
    assert(rows(name) == Set((1L, "d1", 10L), (2L, "d1", 20L)))
  }

  test("UPDATE: one DV + staged-files commit, partition moves included") {
    val (root, name) = mkTable()
    val res = spark.sql(
      s"UPDATE $name SET v = v * 10, day = 'd9' WHERE id IN (1, 3)")
      .as[(Long, Long)].collect().head
    assert(res._2 == 2L)
    assert(Manifest.dvsAt(spark, root, res._1).nonEmpty)
    assert(rows(name) == Set((1L, "d9", 100L), (2L, "d1", 20L),
      (3L, "d9", 300L), (4L, "d3", 40L)))
    // originals stayed physically in place, hidden by the DV
    val before = Manifest.filesAt(spark, root, 1L).toSet
    assert(before.subsetOf(Manifest.current(spark, root).get._2.toSet))
  }

  test("MERGE INTO (keyed whole-row): matched keys replaced by DV, " +
    "new keys inserted, one commit") {
    val (root, name) = mkTable()
    Seq((1L, "d1", 111L), (9L, "d2", 90L)).toDF("id", "day", "v")
      .createOrReplaceTempView("dml_src")
    val res = spark.sql(
      s"""MERGE INTO $name t USING dml_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .as[(Long, Long)].collect().head
    assert(res._2 == 2L, "rows_affected = source rows written")
    assert(rows(name) == Set((1L, "d1", 111L), (2L, "d1", 20L),
      (3L, "d2", 30L), (4L, "d3", 40L), (9L, "d2", 90L)))
    assert(Manifest.dvsAt(spark, root, res._1).nonEmpty,
      "the matched key dies by deletion vector")
  }

  test("INSERT INTO: the rows land as a manifest COMMIT — visible to " +
    "the very next read, not invisible uncommitted part files") {
    val (root, name) = mkTable()
    val res = spark.sql(
      s"INSERT INTO $name VALUES (9, 90, 'd9'), (10, 100, 'd1')")
      .as[(Long, Long)].collect().head
    assert(res == ((2L, 2L)), s"(version, rows) = $res")
    assert(rows(name) == Set((1L, "d1", 10L), (2L, "d1", 20L),
      (3L, "d2", 30L), (4L, "d3", 40L), (9L, "d9", 90L), (10L, "d1", 100L)))
    // the append carried the old files — nothing rewritten
    assert(Manifest.filesAt(spark, root, 1L).toSet
      .subsetOf(Manifest.current(spark, root).get._2.toSet))
  }

  test("INSERT OVERWRITE: static = full-replacement commit (DV refs " +
    "cleared); dynamic = exactly the written partitions replaced") {
    val (root, name) = mkTable()
    spark.sql(s"DELETE FROM $name WHERE id = 1") // pending DV
    spark.sql(s"INSERT OVERWRITE $name VALUES (7, 70, 'd7')")
    assert(rows(name) == Set((7L, "d7", 70L)))
    assert(Manifest.dvsAt(spark, root,
      Manifest.current(spark, root).get._1).isEmpty,
      "full replacement clears the now-inert DV refs")
    val (root2, name2) = mkTable()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE $name2 VALUES (8, 80, 'd1')")
      assert(rows(name2) == Set((8L, "d1", 80L), (3L, "d2", 30L),
        (4L, "d3", 40L)), "only d1 replaced; d2/d3 untouched")
      assert(root2.nonEmpty)
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("out-of-contract DML fails loudly, never a silent partial write") {
    val (root, name) = mkTable()
    // subquery condition: outside the scalar-row-predicate contract
    intercept[UnsupportedOperationException] {
      spark.sql(s"DELETE FROM $name WHERE id IN (SELECT id FROM $name)")
    }
    // a plain (non-manifest) parquet table keeps Spark's own v1 error
    val plain = Files.createTempDirectory("graft_plain").toString + "/p"
    Seq((1L, 2L)).toDF("a", "b").write.parquet(plain)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_dml")
    spark.sql("DROP TABLE IF EXISTS graft_dml.plain")
    spark.sql(s"CREATE TABLE graft_dml.plain USING parquet LOCATION '$plain'")
    intercept[Exception] {
      spark.sql("DELETE FROM graft_dml.plain WHERE a = 1")
    }
    // a version-pinned audit table refuses DML (falls through to
    // Spark's error) — rewriting a pin would fork history invisibly
    GraftTable.register(spark, "graft_dml", "pinned", root,
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v BIGINT, day STRING")),
      partitionCols = Seq("day"), versionAsOf = Some(1L))
    intercept[Exception] {
      spark.sql("DELETE FROM graft_dml.pinned WHERE id = 1")
    }
    // the table itself is untouched by all three failures
    assert(rows(name) == Set((1L, "d1", 10L), (2L, "d1", 20L),
      (3L, "d2", 30L), (4L, "d3", 40L)))
  }

  test("INSERT into a version/group-pinned registration refuses LOUDLY " +
    "— the stock v1 insert would write part files no manifest commits") {
    val (root, name) = mkTable()
    GraftTable.register(spark, "graft_dml", s"pin_ins$n", root,
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v BIGINT, day STRING")),
      partitionCols = Seq("day"), versionAsOf = Some(1L))
    val (fs, rootP) = ((new org.apache.hadoop.fs.Path(root))
      .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(root))
    val before = Manifest.listDataFiles(fs, rootP)
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT INTO graft_dml.pin_ins$n VALUES (9, 90, 'd9')")
    }
    assert(e.getMessage.contains("pinned"), e.getMessage)
    assert(Manifest.listDataFiles(fs, rootP) == before,
      "no stray part files may land on a refused pinned insert")
    assert(rows(name).size == 4)
  }

  test("MERGE whose ON clause is a same-side self-equality (t.id = " +
    "t.id) is NOT a merge key — falls through to Spark's own error, " +
    "never a silent keyed whole-row upsert") {
    val (root, name) = mkTable()
    Seq((1L, "d1", 111L)).toDF("id", "day", "v")
      .createOrReplaceTempView("dml_selfeq_src")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $name t USING dml_selfeq_src s ON t.id = t.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(rows(name) == Set((1L, "d1", 10L), (2L, "d1", 20L),
      (3L, "d2", 30L), (4L, "d3", 40L)), "table untouched")
    assert(root.nonEmpty)
  }
}
