package graft

import org.apache.spark.sql.functions._

import graft.operators.Trend

/** Trend/backtest decision table: exact positive and negative slopes,
  * flat series, gap-aware backtest pairing, translation invariance. */
class TrendSpec extends SparkTestBase {
  import spark.implicits._

  /** One event row per unit of count: series s, day d, count y. */
  private def events(rows: Seq[(String, Long, Long)]): org.apache.spark.sql.DataFrame =
    rows.flatMap { case (s, d, y) => (1L to y).map(_ => (s, d)) }
      .toDF("s", "d")

  private def run(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long, Long)] = {
    Trend.dailyTrendBacktest(events(rows), col("s"), col("d"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("exact unit slope up and down; flat is zero") {
    val up = (0L to 9L).map(d => ("u", d, d + 1))
    val down = (0L to 9L).map(d => ("d", d, 10L - d))
    val flat = (0L to 9L).map(d => ("f", d, 5L))
    val out = run(up ++ down ++ flat)
    assert(out("u")._2 == 1000000L, out.toString)
    assert(out("d")._2 == -1000000L, out.toString)
    assert(out("f")._2 == 0L, out.toString)
  }

  test("seasonal-naive backtest: perfect weekly repeat has zero MAE") {
    // two identical weeks: days 0..13, y cycles 1..7
    val rows = (0L to 13L).map(d => ("w", d, d % 7 + 1))
    val out = run(rows)
    assert(out("w")._3 == 7L, s"7 backtest pairs: $out")
    assert(out("w")._4 == 0L, s"repeat forecasts itself: $out")
  }

  test("constant absolute error surfaces exactly in mae_ppm") {
    // week 2 = week 1 + 3 everywhere -> MAE exactly 3
    val rows = (0L to 6L).map(d => ("w", d, 10L)) ++
      (7L to 13L).map(d => ("w", d, 13L))
    val out = run(rows)
    assert(out("w")._4 == 3000000L, out.toString)
  }

  test("a day gap disqualifies misaligned backtest pairs") {
    // days 0..6 then 8..14: the 7-row lag lands on day-8.. rows whose
    // ancestor is 8-(7)=1.. misaligned by the missing day 7
    val rows = ((0L to 6L) ++ (8L to 14L)).map(d => ("g", d, 5L))
    val out = run(rows)
    assert(out("g")._3 < 7L, s"misaligned pairs must be skipped: $out")
  }

  test("slope is invariant to shifting all days (re-based x)") {
    val a = run((0L to 9L).map(d => ("s", d, d + 1)))
    val b = run((0L to 9L).map(d => ("s", d + 19720L, d + 1)))
    assert(a("s") == b("s"), s"$a vs $b")
  }

  test("single-day series reports slope 0, not a division blowup") {
    val out = run(Seq(("one", 3L, 9L)))
    assert(out("one") == ((1L, 0L, 0L, 0L)), out.toString)
  }
}
