package graft

import org.apache.spark.sql.functions._

import graft.operators.Rfm

/** RFM decision table: exact quintile cutoffs (ties to the lower
  * score), recency anchored on the global latest order, code
  * composition, and the one-customer degenerate case. */
class RfmSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Double)]) =
    Rfm.scores(rows.toDF("c", "d", "p"), col("c"),
        col("d").cast("timestamp"), col("p"))
      .select("custkey", "recency_days", "frequency", "monetary_cents",
        "r", "f", "m", "rfm_code")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)

  test("10 customers, distinct metrics: exactly 2 per quintile, " +
    "ascending in each metric") {
    // customer k orders k times, each order 100.00, last order day k
    val rows = (1 to 10).flatMap { k =>
      (1 to k).map(i => (k.toLong, f"2024-01-${i}%02d 00:00:00", 100.0))
    }
    val out = run(rows)
    // recency: customer 10 ordered last on day 10 = anchor → recency 0 →
    // r=1; customer 1 on day 1 → recency 9 → r=5. frequency/monetary
    // ascend with k → customer 1..2 get f=m=1, 9..10 get f=m=5.
    val byCust = out.map(r => r._1 -> r).toMap
    assert(byCust(10L)._5 == 1 && byCust(1L)._5 == 5, out.mkString(","))
    assert(byCust(1L)._6 == 1 && byCust(10L)._6 == 5)
    assert(byCust(1L)._7 == 1 && byCust(10L)._7 == 5)
    assert(byCust(1L)._8 == 511L && byCust(10L)._8 == 155L)
    (1 to 10).foreach { k =>
      val expected = (k + 1) / 2 // 2 customers per quintile
      assert(byCust(k.toLong)._6 == expected, s"f of $k")
    }
  }

  test("ties land on the LOWER score; cents are exact") {
    // all customers identical → every metric ties → all scores 1
    val rows = (1L to 5L).map(c => (c, "2024-01-01 00:00:00", 19.99))
    val out = run(rows)
    assert(out.forall(r => r._5 == 1 && r._6 == 1 && r._7 == 1 &&
      r._8 == 111L), out.mkString(","))
    assert(out.forall(_._4 == 1999L), "19.99 → 1999 cents exactly")
  }

  test("single customer: recency 0, quintiles all 1") {
    val out = run(Seq((7L, "2024-03-01 00:00:00", 5.0)))
    assert(out.toSeq == Seq((7L, 0L, 1L, 500L, 1L, 1L, 1L, 111L)))
  }
}
