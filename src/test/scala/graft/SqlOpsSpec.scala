package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, Manifest}

/** The SQL operational surface (round 12, the injectParser tier):
  * read-side time travel (`VERSION AS OF`) plus DESCRIBE HISTORY /
  * VACUUM / RESTORE / OPTIMIZE ZORDER / CHECKPOINT over manifest
  * tables, each a thin dispatch to the already-spec'd operator.
  * Non-manifest targets keep Spark's own behavior and errors. */
class SqlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private var n = 0
  private def mkTable(): (String, String) = {
    n += 1
    val root = Files.createTempDirectory("graft_sqlops").toString + "/t"
    Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L), (4L, "d3", 40L))
      .toDF("id", "day", "v").repartition(2)
      .write.partitionBy("day").parquet(root)
    Manifest.bootstrap(spark, root)
    GraftTable.register(spark, "graft_ops", s"t$n", root,
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v BIGINT, day STRING")), partitionCols = Seq("day"))
    (root, s"graft_ops.t$n")
  }

  private def ids(sql: String): Set[Long] =
    spark.sql(sql).select("id").as[Long].collect().toSet

  test("SELECT … VERSION AS OF: time travel as plain SQL — the pinned " +
    "version replays its files AND deletion vectors") {
    val (root, name) = mkTable()                              // v1
    spark.sql(s"DELETE FROM $name WHERE id IN (1, 2)")        // v2: DV
    Seq((9L, "d9", 90L)).toDF("id", "day", "v")               // v3: append
      .write.mode("append").partitionBy("day").parquet(root)
    val (fs, rootP) = ((new org.apache.hadoop.fs.Path(root))
      .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(root))
    Manifest.commit(spark, root, Manifest.listDataFiles(fs, rootP))
    assert(ids(s"SELECT * FROM $name") == Set(3L, 4L, 9L))
    assert(ids(s"SELECT * FROM $name VERSION AS OF 1") ==
      Set(1L, 2L, 3L, 4L), "v1 predates the delete")
    assert(ids(s"SELECT * FROM $name VERSION AS OF 2") == Set(3L, 4L),
      "v2 replays the deletion vector, not the later append")
    // predicates/aggregates compose over the pinned plan
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM $name VERSION AS OF 1 WHERE day = 'd1'")
      .as[Long].head() == 30L)
    // unknown version: loud
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $name VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("99"), e.getMessage)
  }

  test("VERSION AS OF on a NON-manifest table keeps Spark's own " +
    "unsupported-feature error; TIMESTAMP AS OF stays Spark's too") {
    val plain = Files.createTempDirectory("graft_sqlops_p").toString + "/p"
    Seq((1L, 2L)).toDF("a", "b").write.parquet(plain)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ops")
    spark.sql("DROP TABLE IF EXISTS graft_ops.plain")
    spark.sql(s"CREATE TABLE graft_ops.plain USING parquet LOCATION '$plain'")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_ops.plain VERSION AS OF 1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("time travel"), e.getMessage)
    val (_, name) = mkTable()
    val e2 = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM $name TIMESTAMP AS OF '2024-01-01'").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("time travel"), e2.getMessage)
  }

  test("DESCRIBE HISTORY: the audit view as SQL — lifecycle operations " +
    "inferred from the log") {
    val (root, name) = mkTable()                              // v1
    spark.sql(s"DELETE FROM $name WHERE id = 1")              // v2: delete
    spark.sql(s"RESTORE TABLE $name TO VERSION AS OF 1")      // v3: restore
    val h = spark.sql(s"DESCRIBE HISTORY $name")
      .select("version", "operation").as[(Long, String)].collect().toMap
    assert(h == Map(1L -> "bootstrap", 2L -> "delete", 3L -> "restore"),
      h.toString)
    assert(ids(s"SELECT * FROM $name") == Set(1L, 2L, 3L, 4L),
      "the SQL restore resurrected the deleted row")
    assert(root.nonEmpty)
  }

  test("OPTIMIZE … ZORDER BY and CHECKPOINT … RETAIN as SQL: layout " +
    "and log maintenance change shape, never truth") {
    val (root, name) = mkTable()
    val before = ids(s"SELECT * FROM $name")
    val v = spark.sql(s"OPTIMIZE $name ZORDER BY (id, v)")
      .as[Long].head()
    assert(v == 2L)
    assert(ids(s"SELECT * FROM $name") == before)
    // churn + CHECKPOINT RETAIN compacts the log
    val live = Manifest.current(spark, root).get._2
    for (_ <- 1 to 30) Manifest.commit(spark, root, live)
    val ck = spark.sql(s"CHECKPOINT $name RETAIN 5 VERSIONS")
      .as[Long].head()
    assert(ck == 32L)
    assert(Manifest.lastCheckpoint(spark, root).contains(32L))
    assert(Manifest.versions(spark, root).size <= 6,
      "RETAIN must have compacted the per-commit suffix")
    assert(ids(s"SELECT * FROM $name") == before)
    // VACUUM RETAIN 1 VERSIONS GRACE 0 HOURS: physical GC, old
    // versions unreadable (the explicit zero-grace opt-out — a bare
    // VACUUM keeps a 7-day grace window, tested below)
    spark.sql(s"VACUUM $name RETAIN 1 VERSIONS GRACE 0 HOURS")
    intercept[Exception](
      spark.sql(s"SELECT * FROM $name VERSION AS OF 2").collect())
    assert(ids(s"SELECT * FROM $name") == before)
  }

  test("bare VACUUM defaults to a 7-day grace window: freshly-written " +
    "unreferenced files survive (a racing writer's staged artifacts " +
    "and same-week time travel are protected)") {
    val (root, name) = mkTable()                              // v1
    // replace the snapshot: v1's files become unreferenced garbage
    val live = Manifest.current(spark, root).get._2
    Seq((9L, "d9", 90L)).toDF("id", "day", "v")
      .write.mode("append").partitionBy("day").parquet(root)
    val (fs, rootP) = ((new org.apache.hadoop.fs.Path(root))
      .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(root))
    val all = Manifest.listDataFiles(fs, rootP)
    Manifest.commit(spark, root, all.filterNot(live.toSet))   // v2: replace
    spark.sql(s"VACUUM $name") // keep=1, grace=7d: nothing young dies
    val after = Manifest.listDataFiles(fs, rootP).toSet
    assert(live.forall(after), "grace window must keep the young " +
      "unreferenced files a zero-grace vacuum would delete")
    spark.sql(s"VACUUM $name GRACE 0 HOURS") // explicit opt-out
    val after0 = Manifest.listDataFiles(fs, rootP).toSet
    assert(live.forall(f => !after0(f)), "zero grace reclaims them")
  }

  test("the always-on time-travel probe is O(1) for plain statements: " +
    "a statement without the VERSION token never traverses the plan") {
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.parser.ParserInterface
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
    // a plan that BOOBY-TRAPS traversal: any exists() walk throws
    case class TraversalTrap() extends LeafNode {
      override def output: Seq[Attribute] = Nil
      override def exists(f: LogicalPlan => Boolean): Boolean =
        throw new IllegalStateException("plan traversed")
    }
    val real = spark.sessionState.sqlParser
    val trapDelegate = new ParserInterface {
      override def parsePlan(sqlText: String): LogicalPlan = TraversalTrap()
      override def parseExpression(s: String) = real.parseExpression(s)
      override def parseTableIdentifier(s: String) =
        real.parseTableIdentifier(s)
      override def parseFunctionIdentifier(s: String) =
        real.parseFunctionIdentifier(s)
      override def parseMultipartIdentifier(s: String) =
        real.parseMultipartIdentifier(s)
      override def parseTableSchema(s: String) = real.parseTableSchema(s)
      override def parseDataType(s: String) = real.parseDataType(s)
      override def parseQuery(s: String): LogicalPlan = TraversalTrap()
      override def parseRoutineParam(s: String) = real.parseRoutineParam(s)
    }
    val p = new graft.plans.GraftSqlParser(spark, trapDelegate)
    // no VERSION token → the contains pre-check must skip the walk
    assert(p.parsePlan("SELECT a FROM t WHERE b = 1").isInstanceOf[LeafNode])
    // VERSION present → the probe runs (and trips the trap)
    intercept[IllegalStateException] {
      p.parsePlan("SELECT a FROM t VERSION AS OF 3")
    }
  }

  test("maintenance statements refuse non-manifest targets loudly; " +
    "everything else delegates verbatim") {
    intercept[UnsupportedOperationException] {
      spark.sql("DESCRIBE HISTORY graft_ops.plain")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("VACUUM graft_ops.plain")
    }
    // ordinary SQL is untouched by the wrapper
    assert(spark.sql("SELECT 1 + 1 AS x").as[Int].head() == 2)
    assert(spark.sql("DESCRIBE TABLE graft_ops.plain").count() > 0)
  }
}
