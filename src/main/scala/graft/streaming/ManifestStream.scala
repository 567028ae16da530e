package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.GraftDatasetFactory
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.Manifest

/** STREAMING READ OF A MANIFEST TABLE — the incremental-consumption
  * leg of the lakehouse layer (Delta's streaming source / Iceberg's
  * incremental read): `spark.readStream.format(
  * "graft.streaming.ManifestStreamProvider").load(root)` turns the
  * commit log into an exactly-once micro-batch stream, each batch =
  * the files a committed version ADDED, served through the stock
  * vectorized parquet reader. Offsets ARE manifest versions, so the
  * checkpoint pins replay exactly (file lists are immutable), and a
  * restart resumes at the recorded version with no duplicates.
  *
  * Batch semantics are SNAPSHOT-DIFF: getBatch((v1, v2]) serves the
  * rows of `filesAt(v2) -- filesAt(v1)`. Under the append-only
  * discipline (plain [[Manifest.commit]] growth) that is exactly each
  * commit's new rows once. A REPLACEMENT commit (partition merge,
  * compaction) removes files; by default the source REFUSES at that
  * point — silently re-serving rewritten rows is how downstream
  * dedup breaks — unless `ignoreChanges=true`, which serves the
  * replacement's new files in full (the Delta `ignoreChanges`
  * contract: downstream must key-dedup, which
  * [[StreamingUpsert]]-style keyed merges do by construction).
  *
  * Options: `startingVersion` — `latest` (only commits after stream
  * start), a version number (exclusive base), default 0 = the full
  * current snapshot as the first batch. `ignoreChanges` as above.
  * `changeFeed=true` switches to ROW-LEVEL CDC (the Delta CDF
  * analog): the schema gains a trailing `_change_type` column and a
  * replacement commit emits its removed files' rows as `delete` plus
  * its added files' rows as `insert` — an erasure or compaction
  * propagates EXACTLY to a keyed downstream mirror (apply deletes by
  * key, then inserts), which is how a GDPR erasure reaches every
  * derived store. Deleted files must still exist: vacuum retention
  * must cover reader lag, the universal CDF contract.
  * Retention: replaying from a vacuumed-away version fails loudly
  * (the manifest for the recorded offset is gone), matching every
  * table format's retention-vs-checkpoint contract.
  *
  * Scale shape: getOffset is an O(versions) manifest-dir listing;
  * getBatch reads two O(files) manifest texts and plans a bounded
  * parquet scan over exactly the new files — commit-sized work per
  * trigger against an arbitrarily large table, no directory walks,
  * no modification-time heuristics (the weakness of the stock file
  * stream source this replaces). */
class ManifestStreamSource(spark: SparkSession, root: String,
                           dataSchema: StructType,
                           startVersion: Long,
                           ignoreChanges: Boolean,
                           changeFeed: Boolean) extends Source {

  override val schema: StructType =
    if (changeFeed) ManifestStreamProvider.withChangeType(dataSchema)
    else dataSchema

  private def ver(o: Offset): Long = o.json.toLong

  private def filesOf(v: Long): Seq[String] =
    if (v <= 0L) Nil else Manifest.filesAt(spark, root, v)

  /** The rows of `files`, as a STREAMING-marked relation (what
    * MicroBatchExecution requires of a V1 getBatch result). */
  private def fileDf(files: Seq[String]): DataFrame = {
    val rootP = new Path(root)
    val idx = new InMemoryFileIndex(spark, files.map(new Path(rootP, _)),
      Map("basePath" -> root), Some(dataSchema))
    val partSchema = idx.partitionSchema
    val ds = StructType(
      dataSchema.filterNot(f => partSchema.fieldNames.contains(f.name)))
    val rel = HadoopFsRelation(idx, partSchema, ds, None,
      new ParquetFileFormat, Map("basePath" -> root))(spark)
    GraftDatasetFactory.ofRows(spark,
      LogicalRelation(rel, isStreaming = true))
  }

  override def getOffset: Option[Offset] =
    Manifest.current(spark, root).map { case (v, _) => LongOffset(v) }
      .filter(_.offset > startVersion)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startVersion)
    val toV = ver(end)
    val before = filesOf(fromV).toSet
    val now = filesOf(toV)
    val removed = (before -- now.toSet).toSeq.sorted
    val added = now.filterNot(before)
    if (changeFeed) {
      // ROW-LEVEL CHANGE FEED (the Delta CDF contract): removed files'
      // rows emit as `delete`, added files' rows as `insert` — a
      // replacement commit (erasure, compaction, partition merge)
      // becomes delete(old partition rows) + insert(survivors), which
      // a keyed mirror applies exactly. Deleted files must still be on
      // disk: vacuum retention (minAgeMs / keepVersions) must cover
      // the reader's lag, every table format's CDF contract.
      import org.apache.spark.sql.functions.lit
      return fileDf(added).withColumn("_change_type", lit("insert"))
        .unionByName(
          fileDf(removed).withColumn("_change_type", lit("delete")))
    }
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"manifest stream over $root: version range ($fromV, $toV] " +
          s"REMOVED ${removed.size} file(s) (replacement/compaction " +
          s"commit) — an append-only stream cannot represent that " +
          s"exactly. Re-run with changeFeed=true to receive row-level " +
          s"delete+insert events, ignoreChanges=true if the sink " +
          s"key-dedups (e.g. a keyed merge), or stream the table " +
          s"before compaction.")
    fileDf(added)
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format("graft.streaming.ManifestStreamProvider")`
  * — V1 streaming source provider (the stable micro-batch SPI; the
  * file stream source itself still ships on it). */
object ManifestStreamProvider {
  val ChangeTypeCol = "_change_type"

  /** The CDF schema: the data schema plus a trailing `_change_type`
    * (`insert` | `delete`); idempotent when already present. */
  def withChangeType(s: StructType): StructType =
    if (s.fieldNames.contains(ChangeTypeCol)) s
    else s.add(ChangeTypeCol, org.apache.spark.sql.types.StringType,
      nullable = false)

  /** Strip a user-supplied CDF schema back to the data schema. */
  private[streaming] def withoutChangeType(s: StructType): StructType =
    StructType(s.filterNot(_.name == ChangeTypeCol))
}

class ManifestStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "manifest stream needs a path: readStream.format(...).load(<root>)"))

  private def changeFeedOf(parameters: Map[String, String]): Boolean =
    parameters.get("changeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val data = schema.map(ManifestStreamProvider.withoutChangeType)
      .getOrElse(Manifest.read(sqlContext.sparkSession,
        rootOf(parameters)).schema)
    (shortName(),
      if (changeFeedOf(parameters)) ManifestStreamProvider.withChangeType(data)
      else data)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val data = schema.map(ManifestStreamProvider.withoutChangeType)
      .getOrElse(Manifest.read(spark, root).schema)
    val startVersion = parameters.get("startingVersion") match {
      case Some("latest") =>
        Manifest.current(spark, root).map(_._1).getOrElse(0L)
      case Some(v) => v.toLong
      case None => 0L
    }
    val ignoreChanges =
      parameters.get("ignoreChanges").exists(_.toBoolean)
    new ManifestStreamSource(spark, root, data, startVersion,
      ignoreChanges, changeFeedOf(parameters))
  }
}
