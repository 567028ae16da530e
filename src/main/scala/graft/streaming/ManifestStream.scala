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
                           override val schema: StructType,
                           startVersion: Long,
                           ignoreChanges: Boolean) extends Source {

  private def ver(o: Offset): Long = o.json.toLong

  private def filesOf(v: Long): Seq[String] =
    if (v <= 0L) Nil else Manifest.filesAt(spark, root, v)

  override def getOffset: Option[Offset] =
    Manifest.current(spark, root).map { case (v, _) => LongOffset(v) }
      .filter(_.offset > startVersion)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startVersion)
    val toV = ver(end)
    val before = filesOf(fromV).toSet
    val now = filesOf(toV)
    val removed = before -- now.toSet
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"manifest stream over $root: version range ($fromV, $toV] " +
          s"REMOVED ${removed.size} file(s) (replacement/compaction " +
          s"commit) — an append-only stream cannot represent that " +
          s"exactly. Re-run with ignoreChanges=true if the sink " +
          s"key-dedups (e.g. a keyed merge), or stream the table " +
          s"before compaction.")
    val added = now.filterNot(before)
    val rootP = new Path(root)
    val idx = new InMemoryFileIndex(spark, added.map(new Path(rootP, _)),
      Map("basePath" -> root), Some(schema))
    val partSchema = idx.partitionSchema
    val dataSchema = StructType(
      schema.filterNot(f => partSchema.fieldNames.contains(f.name)))
    val rel = HadoopFsRelation(idx, partSchema, dataSchema, None,
      new ParquetFileFormat, Map("basePath" -> root))(spark)
    GraftDatasetFactory.ofRows(spark,
      LogicalRelation(rel, isStreaming = true))
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format("graft.streaming.ManifestStreamProvider")`
  * — V1 streaming source provider (the stable micro-batch SPI; the
  * file stream source itself still ships on it). */
class ManifestStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "manifest stream needs a path: readStream.format(...).load(<root>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse(
      Manifest.read(sqlContext.sparkSession, rootOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val resolved = schema.getOrElse(Manifest.read(spark, root).schema)
    val startVersion = parameters.get("startingVersion") match {
      case Some("latest") =>
        Manifest.current(spark, root).map(_._1).getOrElse(0L)
      case Some(v) => v.toLong
      case None => 0L
    }
    val ignoreChanges =
      parameters.get("ignoreChanges").exists(_.toBoolean)
    new ManifestStreamSource(spark, root, resolved, startVersion,
      ignoreChanges)
  }
}
