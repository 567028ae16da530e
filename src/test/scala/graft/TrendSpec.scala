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

  test("lead-lag: a planted 3-day lead peaks at exactly r = 1.0 at lag 3") {
    // x: a non-degenerate pattern; y is x shifted 3 days later
    val xv = Seq(5L, 9L, 2L, 7L, 4L, 8L, 3L, 6L, 1L, 9L, 5L, 2L)
    val rows = xv.zipWithIndex.flatMap { case (v, d) =>
      Seq(("x", d.toLong, v), ("y", d.toLong + 3L, v)) }
    val out = Trend.leadLag(events(rows), col("s"), col("d"), "x", "y",
        maxLag = 5)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(3L)._2.contains(1.0), s"planted lead: $out")
    assert(out(3L)._1 == 12L, "all 12 days align at the true lag")
    assert(out.filter(_._1 != 3L).values.forall(v =>
      v._2.forall(_ < 1.0)), s"only the true lag is perfect: $out")
  }

  private def mad(rows: Seq[(String, Long, Long)]): Map[(String, Long), (Long, Long, Long, Boolean)] = {
    Trend.madOutliers(events(rows), col("s"), col("d"))
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
  }

  test("cusum: a sustained level shift alarms; noise resets to zero; " +
    "hand-computed reflection identity") {
    // series "shift": 4 days at 10, then 4 days at 30 — μ = 20.
    // n=8, sx=160, k = ⌊160·10/100⌋ = 16; c_i = 8·x − 160 − 16.
    // low days: c = 80−160−16 = −96; high days: c = 240−160−16 = 64.
    // T: −96,−192,−288,−384,−320,−256,−192,−128; runMin hits −384 at
    // day 4, so S = T − min(0, runMin): 0,0,0,0,64,128,192,256.
    // h = ⌊160·50/100⌋ = 80 → alarms on days 6,7,8.
    val rows = (1L to 4L).map(d => ("shift", d, 10L)) ++
      (5L to 8L).map(d => ("shift", d, 30L))
    val out = Trend.cusum(events(rows), col("s"), col("d"))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .sortBy(_._2)
    assert(out.map(_._4).toSeq ==
      Seq(0L, 0L, 0L, 0L, 64L, 128L, 192L, 256L), out.mkString(","))
    assert(out.map(_._5).toSeq ==
      Seq(false, false, false, false, false, true, true, true))
    // pure noise around the mean never accumulates past the slack
    val noise = Seq(("n", 1L, 19L), ("n", 2L, 21L), ("n", 3L, 20L),
      ("n", 4L, 20L), ("n", 5L, 21L), ("n", 6L, 19L))
    val nOut = Trend.cusum(events(noise), col("s"), col("d"))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(nOut.forall(!_._5), nOut.mkString(","))
  }

  test("mad: a 100x burst flags; the median ignores it") {
    // y = 5 for 8 days, 500 on day 8
    val rows = (0L to 7L).map(d => ("s", d, 5L)) :+ (("s", 8L, 500L))
    val out = mad(rows)
    // n=9, lower median rank 5 -> med 5; devs: eight 0s and one 495 ->
    // mad = 0; burst: 495 > 3*0 flags; constant days: 0 > 0 false
    assert(out(("s", 8L)) == ((500L, 5L, 0L, true)), out.toString)
    assert(out(("s", 0L)) == ((5L, 5L, 0L, false)), out.toString)
  }

  test("mad: threshold is exactly 3*MAD, strict") {
    // values 1..7: med = 4, devs {3,2,1,0,1,2,3} sorted {0,1,1,2,2,3,3}
    // rank 4 -> mad = 2; flag iff dev > 6: none (max dev 3)
    val rows = (1L to 7L).map(d => ("t", d, d))
    val out = mad(rows)
    assert(out.values.forall(!_._4), out.toString)
    assert(out(("t", 1L))._2 == 4L && out(("t", 1L))._3 == 2L, out.toString)
    // stretch day 7 to exactly the boundary med + 3*mad = 10: not out;
    // 11 is out
    val b10 = mad(rows.init :+ (("t", 7L, 10L)))
    assert(!b10(("t", 7L))._4, s"boundary is inclusive-safe: $b10")
    val b11 = mad(rows.init :+ (("t", 7L, 11L)))
    assert(b11(("t", 7L))._4, b11.toString)
  }

  test("mad: lower median is a data value, even-count series") {
    // 4 days, y in {1, 2, 100, 101}: lower median = rank 2 -> 2
    val rows = Seq(("e", 1L, 1L), ("e", 2L, 2L), ("e", 3L, 100L),
      ("e", 4L, 101L))
    val out = mad(rows)
    assert(out(("e", 1L))._2 == 2L, out.toString)
  }
}
