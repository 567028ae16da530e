package graft

import org.apache.spark.sql.functions._
import graft.llm.Mixture

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  // 400 web / 100 books / 50 code rows with distinct ids
  private def corpus = (
    (1 to 400).map(i => (i.toLong, "web")) ++
      (401 to 500).map(i => (i.toLong, "books")) ++
      (501 to 550).map(i => (i.toLong, "code"))
    ).toDF("id", "domain")

  test("bottleneck stratum survives whole; others downsample toward the ratio") {
    // weights 2:1:1 -> ratios n/w: web 200, books 100, code 50 -> code
    // is the bottleneck: all 50 kept; books floor(1000*1*50/(1*100))=500
    // per mille; web floor(1000*2*50/(1*400))=250 per mille
    val out = Mixture.sampleToMixture(corpus, col("id"), col("domain"),
      Map("web" -> 2, "books" -> 1, "code" -> 1))
    val n = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(n("code") == 50L)
    // md5 buckets are uniform-ish, not exact: allow a wide band around
    // the expected 250/400*? -> web E=100, books E=50
    assert(n("web") > 60 && n("web") < 140, s"web kept ${n("web")}")
    assert(n("books") > 30 && n("books") < 70, s"books kept ${n("books")}")
  }

  test("strata without a declared weight are dropped") {
    val out = Mixture.sampleToMixture(corpus, col("id"), col("domain"),
      Map("web" -> 1, "books" -> 1))
    assert(!out.select("domain").as[String].collect().contains("code"))
  }

  test("selection is deterministic and partitioning-independent") {
    val w = Map("web" -> 2, "books" -> 1, "code" -> 1)
    val a = Mixture.sampleToMixture(corpus, col("id"), col("domain"), w)
      .select("id").as[Long].collect().toSet
    val b = Mixture.sampleToMixture(corpus.repartition(13), col("id"), col("domain"), w)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperature alpha=0.5: smallest stratum whole, others shrink by sqrt ratio") {
    // n = web 400 / books 100 / code 50; bottleneck = code (min n).
    // pm: code floor(1000*sqrt(50/50))=1000; books floor(1000*sqrt(0.5))=707;
    // web floor(1000*sqrt(0.125))=353
    val out = Mixture.temperatureSample(corpus, col("id"), col("domain"), 0.5)
    val n = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(n("code") == 50L, s"bottleneck must keep all: ${n("code")}")
    // expected kept: books ~70.7, web ~141 — md5-uniform wide bands
    assert(n("books") > 45 && n("books") < 95, s"books kept ${n("books")}")
    assert(n("web") > 100 && n("web") < 185, s"web kept ${n("web")}")
  }

  test("temperature alpha=1 keeps everything; alpha=0 caps every stratum at the bottleneck rate") {
    val all = Mixture.temperatureSample(corpus, col("id"), col("domain"), 1.0)
    assert(all.count() == 550)
    // a NULL stratum is a stratum like any other: unlabeled rows are
    // counted, rate-joined (null-safely) and kept at alpha=1
    val withNull = corpus.union(
      (900 to 919).map(i => (i.toLong, null: String)).toDF("id", "domain"))
    val allN = Mixture.temperatureSample(withNull, col("id"), col("domain"), 1.0)
    assert(allN.count() == 570, "null-stratum rows must not be dropped")
    // alpha=0: pm_s = floor(1000 * nb/ns) — the uniform-count cap
    val flat = Mixture.temperatureSample(corpus, col("id"), col("domain"), 0.0)
    val n = flat.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(n("code") == 50L)
    // web pm=125 (E=50), books pm=500 (E=50): roughly equalized counts
    assert(n("web") > 25 && n("web") < 80, s"web kept ${n("web")}")
    assert(n("books") > 30 && n("books") < 70, s"books kept ${n("books")}")
  }

  test("temperature selection is deterministic, partitioning-independent, and nested across alphas") {
    val a = Mixture.temperatureSample(corpus, col("id"), col("domain"), 0.5)
      .select("id").as[Long].collect().toSet
    val b = Mixture.temperatureSample(corpus.repartition(13), col("id"),
      col("domain"), 0.5).select("id").as[Long].collect().toSet
    assert(a == b)
    // same salt + lower per-stratum rate (smaller alpha) => subset
    val c = Mixture.temperatureSample(corpus, col("id"), col("domain"), 0.25)
      .select("id").as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("doremiWeights: hard domains upweight, mass conserved, exact Longs") {
    // two domains: 'hard' docs are unique-word strings (high bigram
    // xent), 'easy' docs repeat one bigram (low xent)
    val docs = ((0 until 20).map(i =>
        (i.toLong, s"alpha$i beta$i gamma$i delta$i", "hard")) ++
      (20 until 40).map(i =>
        (i.toLong, "ping pong ping pong ping pong", "easy")))
      .toDF("doc_id", "text", "domain")
    val out = Mixture.doremiWeights(docs, col("doc_id"), col("text"),
      col("domain"), rounds = 8)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val (hard, easy) = (out("hard"), out("easy"))
    assert(hard._5 > 0 && easy._5 < 0, "excess signs")
    assert(hard._7 > hard._6 && easy._7 < easy._6,
      s"hard upweights from uniform, easy down: $hard / $easy")
    assert(hard._8 && hard._9, "gates hold")
    val mass = hard._7 + easy._7
    assert(mass <= 1000000L && mass > 1000000L - 2, s"mass $mass")
    // determinism: a second run is bit-identical
    val again = Mixture.doremiWeights(docs, col("doc_id"), col("text"),
      col("domain"), rounds = 8)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("doremiWeights: empty input yields an empty frame with the schema") {
    val docs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "domain")
    val out = Mixture.doremiWeights(docs, col("doc_id"), col("text"),
      col("domain"))
    assert(out.columns.toSeq == Seq("domain", "n_docs", "sum_xent",
      "mean_micro", "excess", "w0_ppm", "w_ppm", "gate_mass",
      "gate_hardest_up"))
    assert(out.count() == 0)
  }

  test("schema is preserved and reserved columns rejected") {
    val out = Mixture.sampleToMixture(corpus, col("id"), col("domain"),
      Map("web" -> 1, "books" -> 1, "code" -> 1))
    assert(out.columns.toSeq == Seq("id", "domain"))
    val bad = corpus.withColumn("_mix_pm", lit(1))
    val e = intercept[IllegalArgumentException] {
      Mixture.sampleToMixture(bad, col("id"), col("domain"), Map("web" -> 1))
    }
    assert(e.getMessage.contains("_mix_pm"))
  }
}
