package graft

import org.apache.spark.sql.functions._
import graft.llm.NaiveBayes

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  // train: d1 positive "good good", d2 negative "bad";
  // score rows exercise seen-positive, unseen, and empty docs.
  private def fixture = Seq(
    (1L, "good good", true, true),
    (2L, "bad", false, true),
    (3L, "good", true, false),   // one positive-only token
    (4L, "zzz", false, false),   // token unseen in train
    (5L, "", false, false)       // empty: prior alone
  ).toDF("doc_id", "text", "y", "tr")

  private def scored = NaiveBayes.trainScore(fixture, col("doc_id"),
    col("text"), col("y"), col("tr"), cache = false)
    .orderBy("doc_id").collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
    .toMap

  test("hand-computed scores: smoothed ratios, prior, empty doc") {
    // V=2 (good, bad), Ng=2, Nb=1, prior = ln(2/2) = 0
    val s = scored
    // "good": ln((2+1)/(2+2)) - ln((0+1)/(1+2)) = ln(9/4)
    val good = math.floor(1e6 * math.log(9.0 / 4.0)).toLong
    assert(s(3L) == ((1L, good, true)))
    // unseen "zzz": ln(1/4) - ln(1/3) = ln(3/4) < 0
    val zzz = math.floor(1e6 * math.log(3.0 / 4.0)).toLong
    assert(s(4L) == ((1L, zzz, false)))
    // empty doc: prior alone = 0, predicted false (score_ppm > 0 strict)
    assert(s(5L) == ((0L, 0L, false)))
    // train docs score too: d1 = 2·ln(9/4)
    assert(s(1L)._2 == math.floor(2e6 * math.log(9.0 / 4.0)).toLong)
  }

  test("deterministic under repartition") {
    val a = NaiveBayes.trainScore(fixture, col("doc_id"), col("text"),
      col("y"), col("tr"), cache = false).collect().toSet
    val b = NaiveBayes.trainScore(fixture.repartition(7), col("doc_id"),
      col("text"), col("y"), col("tr"), cache = false).collect().toSet
    assert(a == b)
  }

  test("count table broadcasts: no corpus-sized shuffle on the scoring join") {
    val plan = NaiveBayes.trainScore(fixture, col("doc_id"), col("text"),
      col("y"), col("tr"), cache = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
