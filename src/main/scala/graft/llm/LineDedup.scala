package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide duplicated-line removal — the C4-style boilerplate scrub
  * (navbars, cookie banners, license headers repeated across pages):
  * drop every line that occurs in at least `minDocs` DISTINCT documents,
  * and reassemble each document's remaining lines in order.
  *
  * Scale shape:
  *  - line frequency is a two-stage map-combinable aggregation over the
  *    line's 60-bit md5 hash (distinct (hash, doc) then count), never
  *    over raw line strings;
  *  - the duplicated-line set (df ≥ minDocs) is SMALL by construction —
  *    boilerplate is the long tail's head — so the anti-join back onto
  *    the exploded lines broadcasts under AQE and the corpus itself is
  *    never shuffled by line;
  *  - reassembly is ONE shuffle by doc id with a bounded-by-document
  *    aggregation state (sort_array over (pos, line) structs keeps the
  *    order deterministic without a window).
  *
  * The DuckDB oracle mirrors the same md5-prefix hash, so the output
  * matches byte-for-byte. Null text passes through as null; a document
  * whose every line is boilerplate comes back as ''.
  */
object LineDedup {

  private def lineHash(c: Column): Column = Splits.md5Long(c)

  /** (doc_id, clean_text): `text` with lines occurring in ≥ `minDocs`
    * distinct documents removed. */
  def removeDuplicatedLines(docs: DataFrame, id: Column, text: Column,
                            minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = docs.select(id.as("doc_id"), text.as("_text"))
    val lines = base
      .select(col("doc_id"), posexplode(split(col("_text"), "\n")).as(Seq("pos", "line")))
      .withColumn("h", lineHash(col("line")))
    // distinct (h, doc) first — partial-aggregatable — then count per h.
    // Blank/whitespace-only lines are STRUCTURE, not boilerplate: without
    // the trim filter, any two documents with a paragraph break would
    // put the empty line in the duplicated set and strip every paragraph
    // boundary in the corpus (round-5 review).
    val dup = lines.where(trim(col("line")) =!= "")
      .select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
      .select(col("h"))
    val kept = lines.join(dup, Seq("h"), "left_anti")
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")), "\n").as("clean_text"))
    // docs whose every line was removed (or with null text) are absent
    // from `rebuilt` — restore them explicitly
    base.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("_text").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"))
  }
}
