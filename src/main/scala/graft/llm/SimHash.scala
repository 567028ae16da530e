package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar '02 random-hyperplane
  * sketch over token features) with pigeonhole hamming-neighbor search.
  *
  * Deterministic construction (DuckDB-mirrorable): token hash = 60-bit
  * md5 prefix; fingerprint bit j is set when the sum over tokens (with
  * multiplicity — term frequency is the weight) of (+1 if token-hash bit
  * j else -1) is positive.
  *
  * Near-duplicate search uses the pigeonhole principle: the 60 bits split
  * into `Segments` equal slices; any pair within hamming distance
  * < Segments must share at least one exact slice — so candidates come
  * from an equi-join on (segment index, segment value), never a crossJoin.
  */
object SimHash {

  val Bits = 60
  val Segments = 4
  val SegBits: Int = Bits / Segments

  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** (doc_id, simhash) — a PURE PROJECTION: the fingerprint depends only
    * on the document's own tokens, so it is computed per row by the
    * native one-pass [[graft.expressions.SimHash60Expr]] (codegen'd;
    * requires GraftExtensions, which GraftSession/Verify/Bench
    * register). The round-2 shape ([[fingerprintsAgg]]) exploded every
    * token and shuffled a 60-column vote buffer per document — kept as
    * the independent formulation the spec asserts bit-equality
    * against. Null-text documents are dropped, as explode did there. */
  def fingerprints(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), call_function("simhash60", text).as("simhash"))
      .where(col("simhash").isNotNull)

  /** Round-2 aggregate formulation: explode tokens → md5 → groupBy(doc)
    * with 60 `sum(when(bit, 1, -1))` votes. */
  def fingerprintsAgg(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(split(text, "\\s+")).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h"))
    val bitSums = (0 until Bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val combined = (0 until Bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), combined.as("simhash"))
  }

  /** Pairs within `maxHamming` (< Segments) by pigeonhole segment join. */
  def nearPairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < Segments,
      s"pigeonhole with $Segments segments only guarantees distance < $Segments")
    val segs = fps.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until Segments).map { s =>
        shiftright(col("simhash"), s * SegBits)
          .bitwiseAND((1L << SegBits) - 1)
      }: _*)).as(Seq("seg", "segval")))
    val l = segs.toDF("doc_a", "sim_a", "seg", "segval")
    val r = segs.toDF("doc_b", "sim_b", "seg", "segval")
    l.join(r, Seq("seg", "segval")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
