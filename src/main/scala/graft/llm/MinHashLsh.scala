package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over a text column —
  * the standard shingle → minhash → band → bucket-join pipeline (as
  * described in Broder '97 / MMDS ch.3), built fully deterministic so a
  * DuckDB oracle can reproduce every hash:
  *
  *  - shingles: distinct word bigrams;
  *  - shingle hash: first 15 hex digits of md5 (60-bit), reduced mod P;
  *  - NumPerms permutations h_i(x) = (a_i * x + b_i) mod P with fixed
  *    Knuth-style coefficients (no RNG);
  *  - bands: Bands x RowsPerBand; band key = md5 of the joined row values;
  *  - candidates: equi-JOIN on (band index, band key) — the shuffle is BY
  *    BAND HASH, never an all-pairs crossJoin — then exact-Jaccard verify.
  *
  * Scale: explode-by-shingle → groupBy(doc) is one map-side-combinable
  * shuffle; the candidate join shuffles by band key (uniform by
  * construction); verification joins only the candidate pairs back to
  * shingle sets. All stages hold at 1000x data.
  */
object MinHashLsh {

  val P: Long = 2147483647L // 2^31 - 1 (prime)
  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands

  def aCoef(i: Int): Long = { val v = (2654435761L * (i + 1)) % P; if (v == 0L) 1L else v }
  def bCoef(i: Int): Long = (40503L * (i + 1) + 17L) % P

  /** Distinct word-bigram shingles of a single-space-tokenized text. */
  def shingles(text: Column): Column = {
    val ws = split(text, "\\s+")
    when(size(ws) >= 2,
      array_distinct(transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))))
      .otherwise(array().cast("array<string>"))
  }

  /** 60-bit md5-derived shingle hash, reduced mod P. */
  def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % P

  /** (doc_id, exploded shingle hash) — the map side of the signature agg. */
  def docShingleHashes(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(shingles(text)).as("shingle"))
      .select(col("doc_id"), shingleHash(col("shingle")).as("h"))

  /** One row per doc with mh0..mh{NumPerms-1} minhash columns.
    * Single shuffle by doc_id; 64 min-aggregates in one pass. */
  def signatures(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val aggs = (0 until NumPerms).map { i =>
      min((lit(aCoef(i)) * col("h") + lit(bCoef(i))) % P).as(s"mh$i")
    }
    docShingleHashes(docs, id, text)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def bandKey(b: Int): Column =
    md5(concat_ws("_", (0 until RowsPerBand).map(j => col(s"mh${b * RowsPerBand + j}")): _*))

  /** (doc_id, band, key) — one row per band. */
  def bandedKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array((0 until Bands).map(bandKey): _*)).as(Seq("band", "key")))

  /** Candidate pairs (doc_a < doc_b) sharing at least one band bucket —
    * bucketed equi-join on (band, key). */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val b = bandedKeys(sigs)
    val l = b.toDF("doc_a", "band", "key")
    val r = b.toDF("doc_b", "band", "key")
    l.join(r, Seq("band", "key")).where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against the true
    * shingle-hash sets; keeps pairs with jaccard >= threshold. */
  def verifiedPairs(docs: DataFrame, id: Column, text: Column,
                    threshold: Double): DataFrame = {
    val sets = docShingleHashes(docs, id, text)
      .groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
    val cands = candidatePairs(signatures(docs, id, text))
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .withColumn("n_shared", size(array_intersect(col("ha"), col("hb"))))
      .withColumn("jaccard", round(
        col("n_shared").cast("double") /
          (size(col("ha")) + size(col("hb")) - col("n_shared")), 4))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
