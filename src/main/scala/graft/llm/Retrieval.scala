package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (Cormack et al. '09) of a
  * LEXICAL arm and a VECTOR arm, the curation primitive behind
  * retrieval-based decontamination and near-duplicate adjudication:
  * the lexical side catches the verbatim/term overlap an embedding
  * smooths away, the vector side catches the paraphrase a lexicon
  * misses, and RRF fuses them WITHOUT score calibration (rank-only —
  * BM25 logs and cosines never meet on one scale).
  *
  * Determinism: RRF is kept in exact integers — each arm contributes
  * `floor(1e6 / (K + rank))` ppm, so the fused score is an
  * order-independent integer sum and the whole report hash-gates
  * (q163); both arms' ranks are already deterministic (rounded scores,
  * doc_id tiebreaks).
  *
  * Scale shape: the lexical arm explodes the corpus ONCE and
  * semi-joins to the (few × few) broadcast query-term set BEFORE any
  * exchange — only matching (doc, term) rows shuffle; the vector arm
  * is whichever top-k the caller picks ([[Similarity.bruteForceTopK]]
  * here as the exact baseline; the q161 selective IVF/LSH arms are
  * drop-in since all emit (query_id, neighbor_id, rank)); the fusion
  * itself is a per-query full-outer join of two k-row lists.
  */
object Retrieval {

  /** Cormack et al.'s smoothing constant. */
  val RrfK = 60
  /** Per-arm and fused retrieval depth. */
  val ArmK = 10
  /** Keywords taken from each query document (its BM25 query). */
  val QueryTerms = 3

  /** Multi-query BM25 — [[Bm25.score]] generalized from one literal
    * term list to a `(query_id, term)` TABLE (each query doc's own
    * keywords): one corpus tokenization, semi-join to the distinct
    * term set before the shuffle, corpus-wide df derived from the tf
    * groups, then the per-(query, doc) score folded in term-sorted
    * order (the q55 bit-stability discipline). Returns
    * `(query_id, doc_id, score)` for docs matching ≥ 1 query term. */
  def bm25Multi(docs: DataFrame, id: Column, text: Column,
                queryTerms: DataFrame,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withLen = docs
      .select(id.as("doc_id"), TextOps.lowerTokens(text).as("_toks"))
      .select(col("doc_id"),
        coalesce(size(col("_toks")), lit(0)).cast("long").as("dl"),
        col("_toks"))
    val stats = withLen.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qt = queryTerms.select(col("query_id"), col("term")).distinct()
    val tok = withLen
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"), "left_semi")
    val tf = tok.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfTbl, "term").crossJoin(stats)
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qt), Seq("term")) // fan each matched term out to its queries
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score0"))
      .select(col("query_id"), col("doc_id"),
        round(col("score0"), 4).as("score"))
  }

  /** Fuse ranked arms (each `(query_id, doc_id, rank)`) by integer
    * RRF; emits per-arm ranks (null where an arm missed the doc), the
    * fused `rrf_ppm`, and the fused `rank`, top `topK` per query. */
  def rrfFuse(arms: Seq[(String, DataFrame)],
              rrfK: Int = RrfK, topK: Int = ArmK): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    val contribs = arms.map { case (name, df) =>
      df.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as(s"${name}_rank"))
    }
    val joined = contribs.reduce(
      (a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    val ppm = arms.map { case (name, _) =>
      coalesce(floor(lit(1000000.0) / (lit(rrfK) + col(s"${name}_rank")))
        .cast("long"), lit(0L))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
    joined.withColumn("rrf_ppm", ppm)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
  }

  /** The assembled hybrid: each query document (selected by `docPred`
    * on documents / `vecPred` on embeddings — same ids) retrieves by
    * its own top-[[QueryTerms]] TF-IDF keywords (lexical arm, BM25)
    * and its embedding (vector arm, exact cosine), fused by RRF.
    * Self-matches are excluded from both arms. */
  /** The lexical arm alone: per query document (selected by `docPred`),
    * BM25 over its own top-[[QueryTerms]] TF-IDF keywords, self-matches
    * excluded, ranked `(query_id, doc_id, rank)` with rank ≤ k. */
  def lexicalArm(docs: DataFrame, docPred: Column,
                 k: Int = ArmK): DataFrame = {
    val kw = TfIdf.topTerms(docs, col("doc_id"), col("text"),
        QueryTerms, cache = false, docPred = docPred)
      .select(col("doc_id").as("query_id"), col("term"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Multi(docs, col("doc_id"), col("text"), kw)
      .where(col("query_id") =!= col("doc_id"))
      .withColumn("rank", row_number().over(wq).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "rank")
  }

  /** The vector arm alone: exact cosine top-k per query embedding
    * (selected by `vecPred`), `(query_id, doc_id, rank)`. */
  def vectorArm(emb: DataFrame, vecPred: Column, k: Int = ArmK): DataFrame =
    Similarity.bruteForceTopK(emb, vecPred, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))

  def hybrid(docs: DataFrame, emb: DataFrame,
             docPred: Column, vecPred: Column, k: Int = ArmK): DataFrame =
    rrfFuse(Seq("lex" -> lexicalArm(docs, docPred, k),
      "vec" -> vectorArm(emb, vecPred, k)), RrfK, k)
}
