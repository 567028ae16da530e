package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — diff two versions of a keyed table into
  * added / removed / changed / unchanged rows. The ingest-regression
  * primitive of a continuously-rebuilt corpus: "yesterday's crawl vs
  * today's — what actually moved?" runs as ONE full-outer equi-join on
  * the key, comparing md5 CONTENT DIGESTS computed map-side, so the
  * shuffle carries (key, 32-hex) per row — never the payload. With both
  * snapshots written bucketed by the key ([[graft.sources.Bucketing]])
  * even that join plans shuffle-free.
  *
  * Presence is tracked separately from the digest, and digests compare
  * null-safely (`<=>`): a key whose content is null in BOTH snapshots
  * is unchanged — null content never masquerades as an absent key.
  * Keys must be unique per snapshot (enforce upstream with
  * [[Expectations.Unique]]).
  */
object SnapshotDiff {

  /** (key, status) for every key in either snapshot; status ∈
    * {added, removed, changed, unchanged} relative to `old` → `neu`. */
  def diff(old: DataFrame, neu: DataFrame, id: Column,
           content: Column): DataFrame = {
    val l = old.select(id.as("key"), lit(true).as("_in_old"),
      md5(content.cast("string")).as("_d_old"))
    val r = neu.select(id.as("key"), lit(true).as("_in_new"),
      md5(content.cast("string")).as("_d_new"))
    l.join(r, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(col("_d_old") <=> col("_d_new"), "unchanged")
          .otherwise("changed"))
      .select("key", "status")
  }
}
