package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership pruning — the broadcast pre-filter that
  * replaces a corpus-sized shuffle with a map-side test when checking
  * the corpus against a much smaller key set (decontamination against
  * an eval set, re-admission against yesterday's fingerprints, URL
  * revisit checks). A semi-join on fingerprint shuffles BOTH sides by
  * the key; the bloom form broadcasts a bounded structure and filters
  * in place — at 100 TB that is the difference between a full exchange
  * of the corpus and none. False positives are possible (and get
  * resolved by the exact path on the shrunken survivor set); false
  * negatives are NOT — that one-sided guarantee is what the oracle
  * gates (q93), alongside the bit-exact filter content.
  *
  * Representation: the filter is the SORTED SET of set bit positions
  * (k md5-derived probes per key into [0, m)), built as a 1-row
  * aggregate and broadcast — never driver-collected. Size is at most
  * k·|keys| longs, ≪ m while the key side is small (the use case); a
  * dense m-bit binary bitset is the drop-in upgrade if the key side
  * ever approaches m/k, without changing any probe math. Probes derive
  * from [[Splits.md5Long]], the engine's one hash-to-long, so the
  * DuckDB oracle reproduces the exact filter.
  */
object BloomPrune {

  /** The k probe positions of a key: md5Long(key + "#" + i) mod m. */
  def positions(key: Column, m: Int, k: Int): Column = {
    require(m > 0 && k > 0, s"need positive m/k: $m/$k")
    transform(sequence(lit(0), lit(k - 1)),
      i => Splits.md5Long(concat(key, lit("#"), i.cast("string"))) % m)
  }

  /** 1-row DataFrame `(bits: array<long>)`: the sorted distinct probe
    * positions of every key — the bloom filter. Map-combinable
    * (collect_set partials merge), broadcasts at the join site. */
  def buildBits(keys: DataFrame, key: Column, m: Int, k: Int): DataFrame =
    keys.select(explode(positions(key, m, k)).as("_p"))
      .agg(sort_array(collect_set(col("_p"))).as("bits"))

  /** `df` plus a `bloom_hit` boolean: true iff every probe position of
    * `key` is set in the (broadcast) filter. Map-side — no shuffle of
    * `df`. Guarantee: a key that was fed to [[buildBits]] always tests
    * true; a miss is definitive. */
  def mightContain(df: DataFrame, key: Column, bits: DataFrame,
                   m: Int, k: Int): DataFrame = {
    // reserved-column guard (DedupClusters.survivors precedent): an
    // input `bits` would make the array_contains reference ambiguous
    // after the crossJoin, and an input `bloom_hit` would be clobbered
    require(!df.columns.contains("bits") && !df.columns.contains("bloom_hit"),
      "input must not contain the reserved columns bits / bloom_hit")
    df.crossJoin(broadcast(bits))
      .withColumn("bloom_hit",
        forall(positions(key, m, k), p => array_contains(col("bits"), p)))
      .drop("bits")
  }
}
