package graft

import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  test("Poisson(1) cutoffs are the CDF; md5 weights have mean ~1 and land in 0..7") {
    val c = Bootstrap.Cutoffs
    assert(c.size == 7 && c.head > 0.36 && c.head < 0.37, "P(0) = 1/e")
    assert(c.zip(c.tail).forall { case (a, b) => b > a }, "monotone CDF")
    assert(c.last > 0.9999 && c.last < 1.0, "mass through 6 covers all but ~8e-5")
    val draws = spark.range(10000)
      .select(Bootstrap.poissonWeight(col("id"), lit(0)).as("w"))
    val stats = draws.agg(avg("w"), min("w"), max("w"))
      .as[(Double, Long, Long)].head()
    assert(stats._1 > 0.95 && stats._1 < 1.05,
      s"empirical mean must be ~1: ${stats._1}")
    assert(stats._2 >= 0L && stats._3 <= 7L)
  }

  test("weights are a pure function of (id, replicate): stable under repartition") {
    val a = spark.range(500)
      .select(col("id"), Bootstrap.poissonWeight(col("id"), lit(3)).as("w"))
      .as[(Long, Long)].collect().toMap
    val b = spark.range(500).repartition(7)
      .select(col("id"), Bootstrap.poissonWeight(col("id"), lit(3)).as("w"))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // different replicates draw independently: not all-equal across b
    val across = spark.range(500)
      .select(Bootstrap.poissonWeight(col("id"), lit(0)) =!=
        Bootstrap.poissonWeight(col("id"), lit(1)))
      .as[Boolean].collect()
    assert(across.exists(identity))
  }

  test("meanCi on a constant metric collapses to the point estimate, covered") {
    val df = spark.range(300).select(col("id"), lit(42L).as("x"))
    val out = Bootstrap.meanCi(df, col("id"), col("x"), b = 50, lo = 2, hi = 49)
    val rows = out.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_ppm") == 42000000L, "constant mean, exactly")
      assert(r.getAs[Long]("ci_lo_ppm") == 42000000L)
      assert(r.getAs[Long]("ci_hi_ppm") == 42000000L)
      assert(r.getAs[Long]("point_ppm") == 42000000L)
      assert(r.getAs[Boolean]("covered"))
    }
    spark.catalog.clearCache() // meanCi persists the replicate frame
  }

  test("CI brackets the point estimate and effective sample sizes hover near n") {
    val df = spark.range(400)
      .select(col("id"), (col("id") % 97).cast("long").as("x"))
    val out = Bootstrap.meanCi(df, col("id"), col("x"), b = 100, lo = 3, hi = 98)
      .collect()
    val lo = out.head.getAs[Long]("ci_lo_ppm")
    val hi = out.head.getAs[Long]("ci_hi_ppm")
    val pt = out.head.getAs[Long]("point_ppm")
    assert(lo < hi && lo <= pt && pt <= hi, s"CI [$lo, $hi] must bracket $pt")
    val nEff = out.map(_.getAs[Long]("n_eff"))
    assert(nEff.forall(n => n > 300 && n < 500),
      "Poisson(1) replicate sizes concentrate around n = 400")
    spark.catalog.clearCache()
  }
}
