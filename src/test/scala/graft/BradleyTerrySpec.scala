package graft

import org.apache.spark.sql.functions._

import graft.llm.BradleyTerry

/** Bradley–Terry decision table: closed-form two-item fits, dominance
  * ordering, zero-win pinning, input-order invariance. */
class BradleyTerrySpec extends SparkTestBase {
  import spark.implicits._

  private def fit(prefs: Seq[(Long, Long)],
                  rounds: Int = 8): Map[Long, (Long, Long, Long)] = {
    BradleyTerry.fit(prefs.toDF("w", "l"), col("w"), col("l"), rounds)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("two items, 3:1 record: strengths approach the 750k/250k MLE") {
    // BT MLE for a single pair is the raw win rate
    val out = fit(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)), rounds = 12)
    val (p1, w1, g1) = out(1L)
    val (p2, w2, g2) = out(2L)
    assert(w1 == 3L && w2 == 1L && g1 == 4L && g2 == 4L)
    assert(math.abs(p1 - 750000L) <= 2000, s"p1 = $p1")
    assert(math.abs(p2 - 250000L) <= 2000, s"p2 = $p2")
  }

  test("balanced pair splits the mass evenly") {
    val out = fit(Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(out(1L)._1 - out(2L)._1) <= 1, out.toString)
  }

  test("dominance is ordered: undefeated > mixed > winless") {
    // 1 beats everyone; 2 beats 3; 3 never wins
    val out = fit(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out(1L)._1 > out(2L)._1 && out(2L)._1 > out(3L)._1, out.toString)
    assert(out(3L)._1 == 0L, "winless items pin at 0 (no finite MLE)")
  }

  test("self-duels are dropped; wins and games tally the kept rows") {
    val out = fit(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(out(1L)._2 == 2L && out(1L)._3 == 3L, out.toString)
    assert(out(2L)._2 == 1L && out(2L)._3 == 3L, out.toString)
  }

  test("shuffle-hash state rounds (large-m fallback) match the broadcast rounds") {
    // mirrors fit's internal shapes: edges (i, j, n), state (i, p), wins (i, wi)
    val edges = Seq((1L, 2L, 3L), (2L, 1L, 3L), (1L, 3L, 1L), (3L, 1L, 1L),
      (2L, 3L, 2L), (3L, 2L, 2L)).toDF("i", "j", "n").repartition(col("i"))
    val state = Seq((1L, 333333L), (2L, 333333L), (3L, 333333L)).toDF("i", "p")
    val wins = Seq((1L, 3L), (2L, 2L)).toDF("i", "wi")
    val viaBroadcast = BradleyTerry.oneRoundPlan(edges, state, wins,
      broadcastState = true).as[(Long, Long)].collect().toMap
    val viaShuffle = BradleyTerry.oneRoundPlan(edges, state, wins,
      broadcastState = false).as[(Long, Long)].collect().toMap
    assert(viaBroadcast == viaShuffle, s"$viaBroadcast vs $viaShuffle")
    // the fallback plan really is hash-hinted shuffle joins, not broadcasts
    val plan = BradleyTerry.oneRoundPlan(edges, state, wins,
      broadcastState = false).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("result is invariant to judgment order and partitioning") {
    val prefs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L),
      (2L, 4L), (4L, 1L), (2L, 1L))
    val a = fit(prefs)
    val shuffled = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(prefs)
    val b = BradleyTerry.fit(shuffled.toDF("w", "l").repartition(7),
        col("w"), col("l"), 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(a == b, s"$a vs $b")
  }
}
