package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling — the training-order primitive. A
  * training run wants each epoch to visit documents in a "random" order
  * that is nevertheless REPRODUCIBLE (resume from step N must see the
  * same stream) and cheap to generate at 100 TB. `orderBy(rand())` is
  * neither: per-partition seeds reshuffle under AQE/retries, and a
  * global sort by a random key is one giant range exchange.
  *
  * [[epochOrder]] derives everything from the salted md5 of the id
  * (the [[Splits.md5Long]] hash every deterministic operator shares):
  * the top bits pick one of `shards` shards, the full hash orders
  * WITHIN the shard. A different salt (epoch number) gives an
  * independent permutation; the same salt always gives the same one,
  * on any cluster size, under any AQE re-plan.
  *
  * Scale shape: one hash exchange on the shard key + a within-shard
  * sort — the write-side idiom is `partitionBy(shard)` +
  * `sortWithinPartitions`, and a consumer streams shards in shard
  * order. The per-shard position runs in a window PARTITIONED BY SHARD,
  * so its cost is bounded by the shard size: `shards` is the knob that
  * keeps groups task-sized (pick n_docs/shards ≈ a few hundred MB at
  * 100 TB — e.g. 100k shards — exactly like q65's packing shards).
  */
object Shuffle {

  /** (id, shard, pos): a deterministic permutation of `df`'s rows for
    * epoch `salt`, as shard assignment + dense 1-based position within
    * the shard. Consuming shards in (shard, pos) order replays the
    * epoch's global stream. */
  def epochOrder(df: DataFrame, id: Column, shards: Int,
                 salt: String): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val h = Splits.md5Long(concat(id.cast("string"), lit(salt)))
    df.select(id.as("id"), (h % shards).cast("long").as("shard"),
        h.as("_ord"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_ord"), col("id"))))
      .select(col("id"), col("shard"), col("pos").cast("long").as("pos"))
  }
}
