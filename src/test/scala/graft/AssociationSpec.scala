package graft

import org.apache.spark.sql.functions._

import graft.operators.Association

/** Basket-lift decision table: perfect association vs independence,
  * popularity correction, minCo/topK gates, dedup of repeated items. */
class AssociationSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], minCo: Int = 2,
                  topK: Int = 3): Seq[(Long, Long, Long, Long)] = {
    Association.liftPairs(rows.toDF("b", "i"), col("b"), col("i"),
        minCo, topK)
      .select("item", "partner", "n_co", "lift_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  test("perfect pair in half the baskets: lift = N / c = 2") {
    // 4 baskets; items 1,2 together in baskets 1,2; item 3 alone in 3,4
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (4L, 3L))
    val out = run(rows)
    // lift(1,2) = 2*4/(2*2) = 2.0
    assert(out == Seq((1L, 2L, 2L, 2000000L), (2L, 1L, 2L, 2000000L)),
      out.toString)
  }

  test("independent popular items sit at lift 1") {
    // items 1 and 2 each in all 4 baskets: c_ij=4, lift = 4*4/(4*4)=1
    val rows = (1L to 4L).flatMap(b => Seq((b, 1L), (b, 2L)))
    val out = run(rows)
    assert(out.forall(_._4 == 1000000L), out.toString)
  }

  test("lift separates affinity from popularity") {
    // item 9 in ALL 6 baskets (popular), items 1,2 together in 2 of 6
    val rows = (1L to 6L).map(b => (b, 9L)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val out = run(rows).filter(_._1 == 1L)
    // lift(1,2) = 2*6/(2*2) = 3.0; lift(1,9) = 2*6/(2*6) = 1.0
    assert(out.find(_._2 == 2L).get._4 == 3000000L, out.toString)
    assert(out.find(_._2 == 9L).get._4 == 1000000L, out.toString)
  }

  test("minCo gates singleton co-occurrences; repeats inside a basket dedup") {
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 2L)) // one basket
    assert(run(rows, minCo = 2).isEmpty, "one shared basket < minCo")
    val out = run(rows ++ Seq((2L, 1L), (2L, 2L)), minCo = 2)
    assert(out.forall(_._3 == 2L), s"repeats must not inflate n_co: $out")
  }

  test("maxBasketSize drops a degenerate basket whole — pairs, counts, N") {
    // baskets 1,2 carry the real pair; basket 99 is a 6-item blob that
    // would add pair volume and inflate item counts if it leaked through
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (4L, 3L)) ++ (10L to 15L).map(i => (99L, i))
    val out = Association.liftPairs(rows.toDF("b", "i"), col("b"), col("i"),
        minCo = 2, topK = 3, maxBasketSize = 5)
      .select("item", "partner", "n_co", "n_baskets", "lift_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // identical to the 4-basket perfect-pair case: the blob basket is
    // excluded from N (4, not 5) and forms no pairs at all
    assert(out == Seq((1L, 2L, 2L, 4L, 2000000L), (2L, 1L, 2L, 4L, 2000000L)),
      out.toString)
  }

  test("topK truncates per item by (lift desc, partner asc)") {
    // item 1 pairs with 2,3,4 — all lift-equal; topK=2 keeps partners 2,3
    val rows = (1L to 2L).flatMap(b => Seq((b, 1L), (b, 2L), (b, 3L), (b, 4L)))
    val out = run(rows, topK = 2).filter(_._1 == 1L).map(_._2)
    assert(out == Seq(2L, 3L), out.toString)
  }
}
