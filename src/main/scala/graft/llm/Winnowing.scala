package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicated-SPAN detection via winnowing fingerprints — the
  * ExactSubstr-style signal (long verbatim runs shared across documents:
  * quoted passages, mirrored articles, templated spans) that per-line
  * and whole-document dedup both miss.
  *
  * [[graft.expressions.WinnowExpr]] selects each document's fingerprints
  * in one native pass with the guarantee that any shared substring of
  * ≥ w + k - 1 code points yields a shared fingerprint, so detection is
  * a fingerprint EQUI-JOIN:
  *  - each side is the distinct fingerprint set per doc (map-side);
  *  - over-common fingerprints (df > maxDf — ubiquitous boilerplate
  *    spans, the standard MOSS exclusion) are dropped BEFORE the
  *    self-join, which also bounds the join's per-key fan-out to
  *    maxDf² pairs — no hot key can go quadratic;
  *  - the df table is a map-combinable groupBy, never a window.
  */
object Winnowing {

  /** (doc_id, fps): sorted distinct winnowing fingerprints. */
  def fingerprints(docs: DataFrame, id: Column, text: Column,
                   k: Int = 16, w: Int = 8): DataFrame =
    docs.select(id.as("doc_id"),
      call_function("winnow_fingerprints", text, lit(k), lit(w)).as("fps"))

  /** One row per document pair sharing ≥ `minShared` distinct selected
    * fingerprints — candidates for shared runs of ≥ w + k - 1 code
    * points. Output: (doc_a, doc_b, n_shared). */
  def sharedSpanPairs(docs: DataFrame, id: Column, text: Column,
                      k: Int = 16, w: Int = 8,
                      minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val fp = fingerprints(docs, id, text, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("fp"))
    val usable = fp.join(rare, "fp")
    usable.toDF("fp", "doc_a")
      .join(usable.toDF("fp", "doc_b"), "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
