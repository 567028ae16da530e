package graft

import org.apache.spark.sql.functions._
import graft.llm.{IncrementalDedup, MinHashLsh}

class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep dark forest where nobody ever goes at night"
  private val other = "completely different content about spark query engines and " +
    "columnar execution with vectorized operators everywhere all day long"
  private val third = "yet another unrelated passage that discusses cooking recipes " +
    "for bread pasta and soup with many fresh ingredients from the local market"

  test("crossPairs finds only boundary-crossing pairs, never within-set ones") {
    // corpus holds two near-dups of each other (1,2); batch holds a
    // near-dup of corpus (11) and two near-dups of each other (12,13)
    val corpus = Seq((1L, base), (2L, base.replace("lazy", "sleepy")), (3L, other))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, base.replace("quick", "swift")),
      (12L, third), (13L, third.replace("soup", "stew"))
    ).toDF("doc_id", "text")
    val got = IncrementalDedup.crossPairs(
      MinHashLsh.hashSets(corpus, col("doc_id"), col("text")),
      MinHashLsh.hashSets(batch, col("doc_id"), col("text")), 0.5)
      .select("corpus_id", "batch_id").as[(Long, Long)].collect().toSet
    // within-corpus (1,2) and within-batch (12,13) must NOT appear
    assert(got == Set((1L, 11L), (2L, 11L)))
  }

  test("admit: each drop reason fires, survivors keep schema and content") {
    val corpus = Seq((1L, base), (3L, other)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                            // exact copy of corpus 1 -> dropped
      (11L, third), (12L, third),             // within-batch exact dup -> keep 11
      (13L, base.replace("lazy", "sleepy")),  // near-dup of corpus 1 -> dropped
      (14L, third.replace("soup", "stew")),   // near-dup of batch 11 -> clustered, 11 kept
      (15L, "tiny"),                          // < 2 tokens: no shingles, exact-unique -> kept
      (16L, "standalone sentence mentioning astronomy telescopes planets " +
        "galaxies nebulae and the expanding universe observed at night")
    ).toDF("doc_id", "text")
    val out = IncrementalDedup.admit(corpus, batch, col("doc_id"), col("text"), 0.5)
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 15L, 16L))
  }

  test("admit rejects reserved scratch columns in the batch") {
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val bad = Seq((2L, other, "x")).toDF("doc_id", "text", "_fp")
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.admit(corpus, bad, col("doc_id"), col("text"))
    }
    assert(e.getMessage.contains("_fp"))
  }

  test("admitting an already-admitted batch is a no-op (idempotent growth)") {
    val corpus = Seq((1L, base), (3L, other)).toDF("doc_id", "text")
    val batch = Seq((11L, third), (12L, third.replace("soup", "stew")))
      .toDF("doc_id", "text")
    val admitted = IncrementalDedup.admit(corpus, batch, col("doc_id"), col("text"), 0.5)
    val grown = corpus.unionByName(admitted)
    // re-offering the same batch against the grown corpus admits nothing:
    // 11 is corpus-exact, 12 is a near-dup of the admitted 11
    val again = IncrementalDedup.admit(grown, batch, col("doc_id"), col("text"), 0.5)
    assert(again.count() == 0L)
  }
}
