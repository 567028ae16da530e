package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import graft.sources.{GraftTable, Manifest, ManifestTableResolution}

/** THE SQL FACE OF THE LAKEHOUSE MAINTENANCE SURFACE (the
  * `injectParser` tier, completing the extension-point family next to
  * the expression / optimizer-rule / planner-strategy / resolution-
  * rule tiers): a thin wrapping parser that
  *
  *  - rewrites `SELECT … FROM t VERSION AS OF v` over a manifest
  *    table into the pinned, DV-filtered read plan — read-side time
  *    travel as ANSI SQL, no second registration needed. Spark parses
  *    the syntax for every table but its v1 session-catalog path
  *    throws UNSUPPORTED_FEATURE.TIME_TRAVEL during MAIN resolution,
  *    before any injected rule can run — the parser is the one seam
  *    early enough. Non-manifest tables, temp views, `TIMESTAMP AS
  *    OF`, and non-numeric versions are left untouched (Spark's own
  *    errors stay authoritative — never a silent behavior change).
  *  - accepts the operational statements every table format grows
  *    (Delta's public SQL surface), each dispatching to the existing
  *    operator with its full contract:
  *      `DESCRIBE HISTORY t`                      → Manifest.history
  *      `VACUUM t [RETAIN n VERSIONS]`            → Manifest.vacuum
  *      `RESTORE TABLE t TO VERSION AS OF v`      → Manifest.restore
  *      `OPTIMIZE t ZORDER BY (x, y)`             → Compaction.optimizeZOrder
  *      `CHECKPOINT t [RETAIN n VERSIONS]`        → Manifest.checkpoint (+ cleanLog)
  *    None of these collide with Spark grammar except `DESCRIBE
  *    HISTORY t`, which stock Spark would read as describing a table
  *    named HISTORY — the same precedence choice Delta's parser makes.
  *    Targets must be `graft.manifest=true` catalog tables; anything
  *    else fails loudly at run time.
  *
  * Everything unmatched delegates verbatim — the wrapper adds a few
  * regex probes per statement, no grammar forks. */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  import GraftSqlParser._

  /** The catalog entry iff `ident` names a manifest-marked table in
    * the session catalog — None (leave the plan alone) on anything
    * else, including lookup failures. */
  private def manifestTable(ident: Seq[String]): Option[CatalogTable] =
    try {
      val ti = ident match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case Seq(cat, db, t) if cat == "spark_catalog" =>
          TableIdentifier(t, Some(db))
        case _ => return None
      }
      // temp views shadow tables and never carry table properties
      if (ti.database.isEmpty &&
        spark.sessionState.catalog.isTempView(ident)) return None
      Some(spark.sessionState.catalog.getTableMetadata(ti))
        .filter(_.properties.get(GraftTable.PropManifest).contains("true"))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def requireManifest(ident: Seq[String]): CatalogTable =
    manifestTable(ident).getOrElse(throw new UnsupportedOperationException(
      s"${ident.mkString(".")} is not a graft.manifest=true catalog " +
        s"table — the lakehouse maintenance statements target manifest " +
        s"tables only"))

  private def rootOf(tbl: CatalogTable): String =
    new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim
    val mt: Seq[String] => CatalogTable = requireManifest
    t match {
      case DescribeHistoryRe(ident) =>
        GraftHistoryCommand(spark, mt(parseMultipartIdentifier(ident)))
      case VacuumRe(ident, keep, graceHours) =>
        // default grace = 7 days (the Delta VACUUM default): vacuum's
        // zero-grace arm deletes a racing DML's staged-but-uncommitted
        // DV/files (the racer then publishes dangling references) and
        // instantly destroys all time travel — an operator typing a
        // bare `VACUUM t` gets the safe window; `GRACE 0 HOURS` is the
        // explicit opt-out for scripted single-writer maintenance
        GraftVacuumCommand(spark, mt(parseMultipartIdentifier(ident)),
          Option(keep).map(_.toInt).getOrElse(1),
          minAgeMs = Option(graceHours).map(_.toLong * 3600L * 1000L)
            .getOrElse(7L * 24L * 3600L * 1000L))
      case RestoreRe(ident, v) =>
        GraftRestoreCommand(spark, mt(parseMultipartIdentifier(ident)),
          v.toLong)
      case OptimizeRe(ident, c1, c2) =>
        GraftOptimizeCommand(spark, mt(parseMultipartIdentifier(ident)),
          c1.trim, c2.trim)
      case CheckpointRe(ident, keep) =>
        GraftCheckpointCommand(spark, mt(parseMultipartIdentifier(ident)),
          Option(keep).map(_.toInt))
      case _ =>
        val plan = delegate.parsePlan(sqlText)
        // the time-travel probe is ALWAYS ON (every spark.sql call
        // funnels through here), so it must be provably O(1) for the
        // 99.9% of statements with no time travel: a `VERSION AS OF`
        // clause cannot parse into RelationTimeTravel without the
        // token "VERSION" in the text, and the cheap contains-check
        // skips the O(plan) traversal entirely
        if (!containsIgnoreCase(sqlText, "VERSION") ||
          !plan.exists(_.isInstanceOf[RelationTimeTravel])) plan
        else plan.transformUp {
          case RelationTimeTravel(ur: UnresolvedRelation, None, Some(v))
              if v.nonEmpty && v.forall(_.isDigit) &&
                manifestTable(ur.multipartIdentifier).isDefined =>
            ManifestTableResolution.versionedPlan(spark,
              manifestTable(ur.multipartIdentifier).get, v.toLong)
        }
    }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** Allocation-free case-insensitive substring probe — the always-on
    * pre-check must not itself pay an upper-cased copy of every
    * statement. */
  private[plans] def containsIgnoreCase(s: String, token: String): Boolean = {
    val n = token.length
    var i = 0
    while (i <= s.length - n) {
      if (s.regionMatches(true, i, token, 0, n)) return true
      i += 1
    }
    false
  }

  private val Ident = """((?:[\w]+|`[^`]+`)(?:\.(?:[\w]+|`[^`]+`))*)"""
  private val DescribeHistoryRe =
    ("""(?is)^DESCRIBE\s+HISTORY\s+""" + Ident + """\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?""" +
      """(?:\s+GRACE\s+(\d+)\s+HOURS)?\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^RESTORE\s+(?:TABLE\s+)?""" + Ident +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val OptimizeRe =
    ("""(?is)^OPTIMIZE\s+""" + Ident +
      """\s+ZORDER\s+BY\s*\(\s*([\w`]+)\s*,\s*([\w`]+)\s*\)\s*;?\s*$""").r
  private val CheckpointRe =
    ("""(?is)^CHECKPOINT\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""").r
}

/** `DESCRIBE HISTORY t` — the audit view, from the log alone. */
case class GraftHistoryCommand(@transient session: SparkSession,
                               @transient tbl: CatalogTable)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("files_added", LongType, nullable = false)(),
    AttributeReference("files_removed", LongType, nullable = false)(),
    AttributeReference("dvs_added", LongType, nullable = false)(),
    AttributeReference("dvs_removed", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("timestamp_ms", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Manifest.history(spark,
      new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath)
      .collect().toSeq
}

private[plans] trait VersionOut extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

/** `VACUUM t [RETAIN n VERSIONS] [GRACE h HOURS]` — physical GC under
  * the retention window; files younger than the grace window survive
  * (default 7 days — protects racing writers' staged-but-uncommitted
  * artifacts and same-week time travel); returns the current version. */
case class GraftVacuumCommand(@transient session: SparkSession,
                              @transient tbl: CatalogTable, keep: Int,
                              minAgeMs: Long)
  extends VersionOut {
  override def run(spark: SparkSession): Seq[Row] = {
    val root = new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath
    Manifest.vacuum(spark, root, keepVersions = keep, minAgeMs = minAgeMs)
    Seq(Row(Manifest.current(spark, root).map(_._1).getOrElse(0L)))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF v` — append-only undo. */
case class GraftRestoreCommand(@transient session: SparkSession,
                               @transient tbl: CatalogTable, v: Long)
  extends VersionOut {
  override def run(spark: SparkSession): Seq[Row] = {
    val root = new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath
    val nv = Manifest.restore(spark, root, v)
    spark.catalog.refreshByPath(root)
    Seq(Row(nv))
  }
}

/** `OPTIMIZE t ZORDER BY (x, y)` — one atomic clustered rewrite with
  * colstats refresh (+ bloom-index refresh when the table declares
  * one). Partitioned layouts keep their directory partitioning. */
case class GraftOptimizeCommand(@transient session: SparkSession,
                                @transient tbl: CatalogTable,
                                x: String, y: String)
  extends VersionOut {
  override def run(spark: SparkSession): Seq[Row] = {
    val root = new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath
    val partCol = tbl.partitionColumnNames match {
      case Seq() => None
      case Seq(c) => Some(c)
      case more => throw new UnsupportedOperationException(
        s"OPTIMIZE supports one-level partitioning, " +
          s"${tbl.identifier} has ${more.mkString(", ")}")
    }
    val v = graft.jobs.Compaction.optimizeZOrder(spark, root, x, y,
      partCol = partCol,
      bloomColumn = tbl.properties.get(GraftTable.PropBloomCol),
      bloomIndexPath = tbl.properties.get(GraftTable.PropBloomIdx))
    spark.catalog.refreshByPath(root)
    Seq(Row(v))
  }
}

/** `CHECKPOINT t [RETAIN n VERSIONS]` — consolidate the log at the
  * current version; with RETAIN, also compact entries below the
  * checkpoint/retention cutoff. */
case class GraftCheckpointCommand(@transient session: SparkSession,
                                  @transient tbl: CatalogTable,
                                  keep: Option[Int])
  extends VersionOut {
  override def run(spark: SparkSession): Seq[Row] = {
    val root = new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath
    val v = Manifest.checkpoint(spark, root)
    keep.foreach(k => Manifest.cleanLog(spark, root, k))
    Seq(Row(v))
  }
}
