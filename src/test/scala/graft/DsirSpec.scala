package graft

import org.apache.spark.sql.functions._
import graft.llm.Dsir

/** DSIR importance resampling (llm/Dsir) — hand-checkable properties
  * on a toy corpus plus the determinism/production contracts; the full
  * chain over testdata is oracle-gated via q166.
  *
  * Fixture notes: with m = 4096 buckets the smoothing mass α·m = 2048
  * dwarfs a toy corpus's counts, so ABSOLUTE log weights are all
  * slightly negative (target ⊆ raw makes every ratio ≤ ~1) — what DSIR
  * guarantees, and what these tests assert, is the RELATIVE ordering:
  * target-like docs outweigh junk, by a margin that grows with
  * evidence. The resample fixture repeats its token patterns 30× so
  * the weight gaps (hundreds of nats) decisively dominate the ±few-nat
  * Gumbel noise. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def rep(s: String, n: Int): String = Seq.fill(n)(s).mkString(" ")

  private def toy = Seq(
    (1L, rep("alpha beta gamma", 30), true),
    (2L, rep("beta gamma alpha", 30), true),
    (3L, rep("gamma alpha beta", 30), true),
    (10L, rep("alpha beta gamma beta", 30), false), // target-like
    (11L, rep("zig zag zog", 30), false),           // disjoint junk
    (12L, rep("quux corge grault", 30), false),
    (13L, "", false)                                // no features
  ).toDF("doc_id", "text", "t")

  test("relative ordering: target-like raw doc outweighs disjoint junk by a wide margin") {
    val sc = Dsir.score(toy, col("doc_id"), col("text"), col("t"),
      cache = false)
    val m = sc.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(10L) > m(11L) + 100.0,
      "target-like must outweigh junk decisively (hundreds of nats at 30x)")
    assert(m(11L) < 0.0 && m(12L) < 0.0, "disjoint junk below neutral")
    assert(m(13L) == 0.0, "featureless doc carries the empty product ln 1")
    // the target members themselves are the most target-like of all
    Seq(1L, 2L, 3L).foreach(id => assert(m(id) > m(11L)))
  }

  test("n_feats = unigrams + bigrams; featureless docs present with 0") {
    val small = Seq((1L, "a b c", true), (2L, "x y", false),
      (3L, "", false)).toDF("doc_id", "text", "t")
    val sc = Dsir.score(small, col("doc_id"), col("text"), col("t"),
      cache = false)
    val n = sc.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(n(1L) == 3 + 2)
    assert(n(2L) == 2 + 1)
    assert(n(3L) == 0)
    assert(sc.count() == 3)
  }

  test("resample: P ∝ weight concentrates on the target vocabulary; ranks dense; k bound") {
    // the featureless doc sits at weight e^0 = 1 — NEUTRAL, which in a
    // smoothing-dominated toy outranks every (slightly negative)
    // featured doc: a real DSIR artifact, so keep it out of the pool
    val pool = toy.filter(col("doc_id") =!= 13L)
    val sc = Dsir.score(pool, col("doc_id"), col("text"), col("t"),
      cache = false)
    val sel = Dsir.resample(sc, k = 4).collect().sortBy(_.getLong(4))
    assert(sel.length == 4)
    assert(sel.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L, 4L), "dense ranks")
    assert(sel.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 10L),
      "the four target-vocabulary docs shut out the junk")
    assert(Dsir.resample(sc, k = 100).count() == 6,
      "k beyond the corpus returns everything once")
  }

  test("deterministic under repartition (no RNG anywhere)") {
    val a = Dsir.resample(Dsir.score(toy, col("doc_id"), col("text"),
      col("t"), cache = false), k = 5).collect().map(_.toSeq).toSet
    val b = Dsir.resample(Dsir.score(toy.repartition(7), col("doc_id"),
      col("text"), col("t"), cache = false), k = 5).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }

  test("score plan: ratio table broadcasts onto the per-doc counts") {
    val sc = Dsir.score(toy, col("doc_id"), col("text"), col("t"),
      cache = false)
    val plan = sc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "m-bounded log-ratio table must broadcast onto the per-doc counts")
  }
}
