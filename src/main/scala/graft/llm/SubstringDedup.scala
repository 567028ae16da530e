package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact duplicated-substring detection (the ExactSubstr method of Lee
  * et al. '21, "Deduplicating Training Data Makes Language Models
  * Better") — find, for every document, the maximal character spans
  * that also occur elsewhere in the corpus, so a training pipeline can
  * cut repeated boilerplate out of otherwise-unique documents (where
  * document-level dedup keeps both copies and span-level winnowing only
  * SAMPLES fingerprints).
  *
  * The suffix-array construction of the paper is replaced by the
  * k-gram identity that makes the problem embarrassingly parallel:
  * a substring of length >= k occurs twice iff each of its k-grams
  * occurs twice, so the union of duplicated k-gram windows IS the union
  * of all duplicated runs of length >= k (shorter runs are invisible —
  * that is the k threshold's meaning, matching the paper's min-length).
  * Hash collisions (60-bit Rabin–Karp) can only over-mark, are
  * astronomically rare, and are reproduced exactly by the oracle's
  * mirrored fold.
  *
  * Stages, all linear in corpus size:
  *  1. [[gramOccurrences]]: one native `gram_hashes` pass + posexplode
  *     → (doc_id, pos, h);
  *  2. duplicated grams: map-combinable groupBy(h) count, occurrences
  *     >= 2 (within one doc or across docs both count — self-repeats
  *     are duplication too);
  *  3. mark: one shuffle join of occurrences with the duplicated-gram
  *     set on h — output is bounded by the occurrence count, never a
  *     pair blowup (grams never join grams);
  *  4. [[duplicatedSpans]]: per-doc interval merge of the marked
  *     windows — positions ascend, so span ends ascend with them and a
  *     lag-window break flag + running sum suffices (one per-doc
  *     window pass, bounded by max document length, the same per-doc
  *     bound every text operator here has).
  */
object SubstringDedup {

  /** (doc_id, pos, h): the k-gram Rabin–Karp hash at every code-point
    * position of every document. */
  def gramOccurrences(docs: DataFrame, id: Column, text: Column,
                      k: Int): DataFrame =
    docs.select(id.as("doc_id"),
      posexplode(call_function("gram_hashes", text, lit(k))).as(Seq("pos", "h")))

  /** Maximal duplicated spans (doc_id, start, end) — code-point
    * offsets, end exclusive; overlapping and adjacent duplicated
    * windows merge. */
  def duplicatedSpans(docs: DataFrame, id: Column, text: Column,
                      k: Int, cacheOcc: Boolean = true): DataFrame = {
    val occ0 = gramOccurrences(docs, id, text, k)
    // occurrences feed two branches (the dup-gram count and the mark
    // join); persist-and-checkpoint like the LSH stack, or pass false
    // for a fully lazy, plan-inspectable composition
    val occ = if (cacheOcc)
      occ0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else occ0
    val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2).select("h")
    val marked = occ.join(dup, "h").select("doc_id", "pos")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // positions ascend => window ends (pos + k) ascend: the running
    // max end is simply lag(pos) + k, so a new span starts exactly
    // when this window clears the previous one (pos > lag(pos) + k;
    // equality is adjacency, which merges)
    val spans = marked
      .withColumn("brk",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(w) + k,
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("span", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span"))
      .agg(min(col("pos")).cast("long").as("start"),
        (max(col("pos")) + k).cast("long").as("end"))
      .select("doc_id", "start", "end")
    if (cacheOcc) {
      val out = spans.localCheckpoint(eager = true)
      occ.unpersist()
      out
    } else spans
  }

  /** The corpus with duplicated spans CUT OUT of the text column — the
    * application step (what Lee et al. train on). Docs without spans
    * pass through byte-identical; span offsets and the cut are both
    * code-point based ([[graft.expressions.CutSpansExpr]]). One
    * spans-side groupBy (bounded by doc length) + one key join. */
  def cleaned(docs: DataFrame, id: Column, textCol: String, k: Int): DataFrame = {
    require(docs.columns.contains(textCol),
      s"no column named $textCol in ${docs.columns.mkString(", ")}")
    require(!docs.columns.contains("_graft_id"),
      "input must not contain the reserved column _graft_id")
    val spanArrays = duplicatedSpans(docs, id, col(textCol), k)
      .groupBy(col("doc_id").as("_graft_id"))
      .agg(sort_array(collect_list(struct(col("start"), col("end")))).as("_sp"))
      .select(col("_graft_id"),
        transform(col("_sp"), s => s.getField("start")).as("_starts"),
        transform(col("_sp"), s => s.getField("end")).as("_ends"))
    docs.withColumn("_graft_id", id)
      .join(spanArrays, Seq("_graft_id"), "left")
      .withColumn(textCol, when(col("_starts").isNull, col(textCol))
        .otherwise(call_function("cut_spans", col(textCol),
          col("_starts"), col("_ends"))))
      .drop("_graft_id", "_starts", "_ends")
  }

  /** Per-document duplication stats over ALL documents (span-free docs
    * report zeros): (doc_id, n_spans, n_dup_chars). `n_dup_chars` is
    * the count of code points inside some duplicated run of length
    * >= k — `n_dup_chars / length` is the Lee-et-al. cut ratio a
    * pipeline filters or trims on. */
  def stats(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    require(!docs.columns.contains("_graft_id"),
      "input must not contain the reserved column _graft_id")
    val agg = duplicatedSpans(docs, id, text, k)
      .groupBy(col("doc_id").as("_graft_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("end") - col("start")).as("n_dup_chars"))
    docs.select(id.as("_graft_id"))
      .join(agg, Seq("_graft_id"), "left")
      .select(col("_graft_id").as("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_chars"), lit(0L)).as("n_dup_chars"))
  }
}
