package graft

import org.apache.spark.sql.functions._

import graft.operators.DiffInDiff

/** DiD decision table: hand-computed estimate, trend/composition
  * confounds removed, grid truncation bound. */
class DiffInDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def did(rows: Seq[(Boolean, Boolean, Long)]): (Map[(Boolean, Boolean), (Long, Long, Long)], Long) = {
    val out = DiffInDiff.estimate(rows.toDF("t", "p", "y"),
        col("t"), col("p"), col("y"))
      .as[(Boolean, Boolean, Long, Long, Long, Long)].collect()
    (out.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap,
      out.head._6)
  }

  test("hand case: treatment lifts by 3 on top of a +2 common trend") {
    // control: pre mean 10, post mean 12 (trend +2)
    // treated: pre mean 20, post mean 25 (trend +2, effect +3)
    val rows =
      Seq.fill(4)((false, false, 10L)) ++ Seq.fill(4)((false, true, 12L)) ++
      Seq.fill(4)((true, false, 20L)) ++ Seq.fill(4)((true, true, 25L))
    val (cells, d) = did(rows)
    assert(cells((true, true)) == ((4L, 100L, 25000000L)), cells.toString)
    assert(d == 3000000L, s"the +2 trend and +10 composition cancel: $d")
  }

  test("no effect, strong trend and composition: DiD is exactly 0") {
    val rows =
      Seq.fill(3)((false, false, 5L)) ++ Seq.fill(3)((false, true, 50L)) ++
      Seq.fill(3)((true, false, 105L)) ++ Seq.fill(3)((true, true, 150L))
    val (_, d) = did(rows)
    assert(d == 0L, d.toString)
  }

  test("unbalanced cells use their own exact denominators") {
    // treated-post mean 7/3 -> 2333333 ppm (floor)
    val rows = Seq((true, true, 2L), (true, true, 2L), (true, true, 3L),
      (true, false, 1L), (false, true, 1L), (false, false, 1L))
    val (cells, d) = did(rows)
    assert(cells((true, true)) == ((3L, 7L, 2333333L)), cells.toString)
    assert(d == 2333333L - 1000000L - (1000000L - 1000000L), d.toString)
  }
}
