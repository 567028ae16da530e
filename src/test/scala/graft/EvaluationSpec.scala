package graft

import org.apache.spark.sql.functions._

import graft.llm.Evaluation

/** Ranking-metric decision table: hand-computed AUC (including the
  * tie half-credit), perfect/inverted rankings, decile gains math. */
class EvaluationSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows: Seq[(String, Long, Boolean)]): Map[String, (Long, Long, Long, Long)] = {
    Evaluation.aucByGroup(rows.toDF("g", "s", "y"),
        col("g"), col("s"), col("y"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("hand case: 3 of 4 pos-neg pairs ordered correctly -> 750000") {
    val out = auc(Seq(("a", 5L, true), ("a", 3L, true),
      ("a", 4L, false), ("a", 1L, false)))
    assert(out("a") == ((2L, 2L, 6L, 750000L)), out.toString)
  }

  test("perfect separation is 1.0; inverted is 0.0") {
    val perfect = auc(Seq(("a", 10L, true), ("a", 9L, true),
      ("a", 2L, false), ("a", 1L, false)))
    assert(perfect("a")._4 == 1000000L, perfect.toString)
    val inverted = auc(Seq(("a", 1L, true), ("a", 10L, false)))
    assert(inverted("a")._4 == 0L, inverted.toString)
  }

  test("a full tie scores exactly half credit") {
    val out = auc(Seq(("a", 2L, true), ("a", 2L, false)))
    assert(out("a") == ((1L, 1L, 1L, 500000L)), out.toString)
  }

  test("groups are independent; a one-class group reports 0 safely") {
    val out = auc(Seq(("a", 5L, true), ("a", 1L, false),
      ("b", 7L, true), ("b", 8L, true)))
    assert(out("a")._4 == 1000000L)
    assert(out("b") == ((2L, 0L, 0L, 0L)), out.toString)
  }

  test("decile gains: top-half positives give lift 2.0 and full capture at decile 4") {
    // 20 rows, scores 20..1, the top 10 scores positive
    val rows = (1 to 20).map(i => ("g", i.toLong, i > 10))
    val out = Evaluation.liftTable(rows.toDF("g", "s", "y"),
        col("g"), col("s"), col("y"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(out.keySet == (0L to 9L).toSet, out.toString)
    assert((0L to 4L).forall(d => out(d) == ((2L, 2L, 1000000L, 2 * (d + 1), 200000L * (d + 1), 2000000L))), out.toString)
    assert((5L to 9L).forall(d => out(d)._2 == 0L && out(d)._6 == 0L), out.toString)
    assert(out(4L)._5 == 1000000L, "all positives captured by decile 4")
  }

  private def rbo(a: Seq[(Long, Long, Long)],
                  b: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    Evaluation.rbo10(a.toDF("query_id", "doc_id", "rank"),
        b.toDF("query_id", "doc_id", "rank"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
  }

  test("rbo: identical top-10s score exactly 1e6; disjoint score 0") {
    val r1 = (1L to 10L).map(d => (1L, 100L + d, d))
    val r2 = (1L to 10L).map(d => (2L, 200L + d, d))
    val out = rbo(r1 ++ r2, r1 ++ r2.map(t => (t._1, t._2 + 50L, t._3)))
    assert(out(1L) == ((10L, 1000000L)), out.toString)
    assert(out(2L) == ((0L, 0L)), out.toString)
  }

  test("rbo weight table: top-rank agreement dominates tail agreement") {
    // only rank 1 agrees vs only rank 10 agrees
    val base = (1L to 10L).map(d => (1L, 100L + d, d))
    val top = rbo(base, base.map { case (q, i, r) =>
      (q, if (r == 1L) i else i + 50L, r) })(1L)
    val tail = rbo(base, base.map { case (q, i, r) =>
      (q, if (r == 10L) i else i + 50L, r) })(1L)
    assert(top._1 == 1L && tail._1 == 1L)
    assert(top._2 > 14L * tail._2,
      s"rank-1 weight must dominate: $top vs $tail")
    // exact values from the integer table
    assert(top._2 == (1000000L * Evaluation.RboWeights(0)) / Evaluation.RboMax)
    assert(tail._2 == (1000000L * Evaluation.RboWeights(9)) / Evaluation.RboMax)
  }

  test("rbo: order permutation within the same set lowers the score") {
    val base = (1L to 10L).map(d => (1L, 100L + d, d))
    val reversed = base.map { case (q, i, r) => (q, i, 11L - r) }
    val same = rbo(base, base)(1L)._2
    val perm = rbo(base, reversed)(1L)._2
    assert(same == 1000000L && perm < same && perm > 0L,
      s"same=$same perm=$perm")
  }

  private def kappa(units: Seq[(Long, Int, Boolean)]): (Long, Long, Long, Long, Long, Long, Long) = {
    // (unit, judgment order, outcome)
    Evaluation.cohenKappa(units.toDF("u", "ord", "o"),
        col("u"), col("o"), Seq(col("ord")))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
  }

  test("kappa: perfect repeat agreement scores exactly 1e6") {
    val units = Seq((1L, 1, true), (1L, 2, true), (2L, 1, false),
      (2L, 2, false))
    val out = kappa(units)
    assert(out == ((2L, 1L, 0L, 0L, 1L, 1000000L, 1000000L)), out.toString)
  }

  test("kappa: chance-level agreement scores exactly 0 despite po = 1/2") {
    // uniform 2x2 table: a=b=c=d=1
    val units = Seq(
      (1L, 1, true), (1L, 2, true), (2L, 1, true), (2L, 2, false),
      (3L, 1, false), (3L, 2, true), (4L, 1, false), (4L, 2, false))
    val out = kappa(units)
    assert(out._6 == 500000L && out._7 == 0L, out.toString)
  }

  test("kappa: systematic flip scores exactly -1e6") {
    val units = Seq((1L, 1, true), (1L, 2, false), (2L, 1, false),
      (2L, 2, true))
    val out = kappa(units)
    assert(out._7 == -1000000L, out.toString)
  }

  test("kappa: degenerate all-same marginals fall back to 0; singles skipped") {
    val units = Seq((1L, 1, true), (1L, 2, true), (2L, 1, true),
      (2L, 2, true), (3L, 1, true)) // unit 3 has one judgment
    val out = kappa(units)
    assert(out._1 == 2L, "singleton unit skipped")
    assert(out._7 == 0L, "pe = 1 has no information; convention 0")
  }

  test("score ties share a decile: bins are uneven but deterministic") {
    // 10 rows all score 7: one bin, decile 0, holding everything
    val rows = (1 to 10).map(i => ("g", 7L, i % 2 == 0))
    val out = Evaluation.liftTable(rows.toDF("g", "s", "y"),
        col("g"), col("s"), col("y"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._2 == 0L && out.head._3 == 10L,
      out.mkString(","))
    assert(out.head._8 == 1000000L, "uniform bin has lift exactly 1")
  }
}
