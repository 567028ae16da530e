package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring — the lexical ranking primitive (quality-ranked
  * retrieval over a corpus, dataset curation by query relevance, the
  * baseline next to the ANN operators' vector search).
  *
  *   score(d) = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
  *                · tf_td (k1+1) / (tf_td + k1 (1 - b + b·|d|/avgdl))
  *
  * Scale shape: tokens explode map-side and are FILTERED TO THE QUERY
  * TERMS before anything shuffles, so the exchanges touch only
  * query-matching rows — (doc, term) tf counts and the tiny per-term df
  * table (≤ |query| rows, broadcast). The corpus scalars (N, avgdl)
  * reduce from exact integer sums, so they are bit-identical on any
  * engine; per-document term scores are folded in term-sorted order
  * (float addition is not associative — an unordered SUM could differ
  * from the oracle in the last ulp) and rounded to 4 decimals.
  */
object Bm25 {

  def score(docs: DataFrame, id: Column, text: Column, query0: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tokens are lowercased, so match terms the same way; a term with
    // whitespace could never equal a \s+-split token — reject it loudly
    val query = query0.map(_.toLowerCase)
    require(query.nonEmpty, "bm25 needs at least one query term")
    require(query.distinct == query, "query terms must be distinct")
    require(query.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"query terms must be non-empty single tokens: ${query0.mkString(", ")}")
    val withLen = docs.select(id.as("doc_id"),
      TextOps.lowerTokens(text).as("_toks"))
      .select(col("doc_id"),
        coalesce(size(col("_toks")), lit(0)).cast("long").as("dl"),
        col("_toks"))
    // N and avgdl over the WHOLE corpus (null-text docs count with dl=0)
    val stats = withLen.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tok = withLen
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("term"))
      .where(col("term").isin(query: _*))
    val tf = tok.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf's groups ARE the distinct (doc, term) pairs — deriving df from
    // them (instead of a separate distinct over tok) saves a third full
    // corpus tokenization pass (round-5 review)
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfTbl, "term").crossJoin(stats)
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy(col("doc_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0),
        (acc, x) => acc + x.getField("s")).as("score0"))
      .select(col("doc_id"), round(col("score0"), 4).as("score"))
  }
}
