package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The loader-facing landing of the training artifact — the LLM-side
  * twin of [[DailyJob]]+[[GaCatalog]]'s serve stage: assembled
  * sequences ([[graft.llm.Packing.assembleSequences]]) written as a
  * shard-partitioned tree and registered as a metastore table, so a
  * training loader (or any SQL client) addresses epochs by
  * `train.sequences WHERE shard = ...` with metastore-answered
  * partition pruning instead of hand-glued paths.
  *
  * Layout contract: `partitionBy(shard)` with the data
  * repartition-sorted on (shard, seq_no) first, so each shard
  * directory holds ONE file whose row order IS the pack order — a
  * loader streams a shard without sorting, and shards are the unit of
  * parallel consumption (same reasoning as the epoch-order shards,
  * q126). Writes are `overwrite` of the whole tree: the artifact is a
  * VERSION (like the tokenizer vocab), re-materialized per corpus cut,
  * not appended to.
  */
object TrainingArtifact {

  /** Write `assembled` (shard, seq_no, n_docs, tokens) under
    * `outRoot/sequences`, one pack-ordered file per shard. */
  def write(assembled: DataFrame, outRoot: String): Unit =
    assembled
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_no"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(s"$outRoot/sequences")

  /** Register (crawler-style, idempotent — the [[GaCatalog]] contract)
    * the sequences tree as `<db>.sequences`. */
  def register(spark: SparkSession, outRoot: String,
               db: String = "train"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.sequences")
    spark.sql(
      s"CREATE TABLE $db.sequences USING parquet LOCATION '$outRoot/sequences'")
    spark.sql(s"ALTER TABLE $db.sequences RECOVER PARTITIONS")
  }
}
