package graft

import org.apache.spark.sql.functions._

import graft.llm.NegativeSampling

/** Negative-sampling decision table: radical-weight exactness, 3/4-power
  * flattening, CDF interval ownership, probe coverage, determinism. */
class NegativeSamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def table(texts: Seq[String], k: Int): Seq[(Long, Long, String, Long, Long)] =
    NegativeSampling.sampleTable(texts.zipWithIndex.map(_.swap)
        .toDF("doc_id", "text"), col("text"), k)
      .as[(Long, Long, String, Long, Long)].collect().toSeq.sortBy(_._1)

  test("weights are exact floor(n^(3/4)) for known counts") {
    // counts: a=16 -> w=8; b=81 -> w=27; c=1 -> w=1
    val texts = Seq.fill(16)("a") ++ Seq.fill(81)("b") ++ Seq("c")
    val rows = table(texts, 4)
    val w = rows.map(r => r._3 -> r._5).toMap
    assert(w.get("a").forall(_ == 8L) && w.get("b").forall(_ == 27L),
      rows.toString)
  }

  test("probe shares track the smoothed (not raw) distribution") {
    // raw counts 16:81 would give b ~83% of probes; smoothed 8/27 gives
    // b 27/36 = 75% and a 8/36 ~ 22%
    val texts = Seq.fill(16)("aaa") ++ Seq.fill(81)("bbb")
    val rows = table(texts, 36)
    val byTok = rows.groupBy(_._3).view.mapValues(_.size).toMap
    // W = 35, aaa owns [0,8): t_k = floor(35k/36) < 8 for k = 0..8 ->
    // 9 probes (the floor grid slightly favors the first interval)
    assert(byTok("aaa") == 9 && byTok("bbb") == 27,
      s"stratified probes split at the exact CDF boundary: $byTok")
  }

  test("every probe lands in exactly one interval; k rows out") {
    val texts = Seq.fill(5)("x y z") ++ Seq("p q r s")
    val rows = table(texts, 100)
    assert(rows.size == 100)
    assert(rows.map(_._1).distinct.size == 100)
    rows.foreach { case (_, t, _, _, _) => assert(t >= 0) }
  }

  test("repeated runs and repartitioned input give identical tables") {
    val df = (1 to 50).map(i => (i.toLong, s"tok${i % 7} tok${i % 3}"))
      .toDF("doc_id", "text")
    val a = NegativeSampling.sampleTable(df, col("text"), 50)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = NegativeSampling.sampleTable(df.repartition(13), col("text"), 50)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("minCount prunes the tail before weighting") {
    val texts = Seq.fill(9)("keep") ++ Seq("rare")
    val rows = NegativeSampling.sampleTable(
        texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"),
        col("text"), 10, minCount = 2L)
      .as[(Long, Long, String, Long, Long)].collect()
    assert(rows.forall(_._3 == "keep"), rows.mkString(","))
  }
}
