package graft

import org.apache.spark.sql.functions._

import graft.llm.{Bm25, Retrieval}

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("rrfFuse: overlap doc sums both arms' contributions and outranks " +
    "either arm's solo winner; per-arm ranks carried, nulls where missed") {
    // query 1: doc 7 is rank 2 lexically AND rank 3 vectorially — its
    // fused 1e6/62 + 1e6/63 = 16129 + 15873 = 32002 must beat both solo
    // rank-1 docs (1e6/61 = 16393)
    val lex = Seq((1L, 5L, 1L), (1L, 7L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 9L, 1L), (1L, 7L, 3L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec))
      .orderBy("rank")
      .select("doc_id", "lex_rank", "vec_rank", "rrf_ppm", "rank")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getLong(3), r.getLong(4)))
    assert(out(0) == ((7L, Some(2L), Some(3L), 32002L, 1L)))
    // solo docs tie at 16393 ppm; doc_id breaks it deterministically
    assert(out(1) == ((5L, Some(1L), None, 16393L, 2L)))
    assert(out(2) == ((9L, None, Some(1L), 16393L, 3L)))
  }

  test("bm25Multi degenerates to Bm25.score for a single shared query") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val terms = Seq("hash", "merge", "vector")
    val single = Bm25.score(docs, col("doc_id"), col("text"), terms)
      .as[(Long, Double)].collect().toMap
    val qt = terms.map((42L, _)).toDF("query_id", "term")
    val multi = Retrieval.bm25Multi(docs, col("doc_id"), col("text"), qt)
      .as[(Long, Long, Double)].collect()
    assert(multi.forall(_._1 == 42L))
    val multiMap = multi.map { case (_, d, s) => d -> s }.toMap
    assert(multiMap == single, "multi-query BM25 must be bit-equal to q55's")
  }

  test("hybrid on the fixture: self excluded, ranks dense 1..10, fused " +
    "list interleaves both arms") {
    val out = Retrieval.hybrid(
      graft.sources.Tables.documents(spark, sf),
      graft.sources.Tables.embeddings(spark, sf),
      col("doc_id") < 10, col("vec_id") < 10)
    val rows = out.select("query_id", "doc_id", "lex_rank", "vec_rank", "rank")
      .collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to 10L),
        "fused ranks must be dense 1..10")
      // both modalities represented in every fused list (the fixture's
      // arms never agree, so a one-armed list would mean a lost arm)
      assert(rs.exists(r => !r.isNullAt(2)) && rs.exists(r => !r.isNullAt(3)))
    }
  }
}
