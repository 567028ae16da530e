package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IntStats._

/** graft.operators.IntStats — deterministic statistics from integer
  * moment sums. The load-bearing claims: (1) the formulas agree with the
  * textbook definitions (cross-checked against Spark's own floating
  * aggregates within fp tolerance), (2) the results are EXACTLY invariant
  * under repartitioning — the property Spark's corr/stddev aggregates do
  * not have and the reason IntStats exists.
  */
class IntStatsSpec extends SparkTestBase {
  import spark.implicits._

  // Deterministic pseudo-random integer rows: x, then y linearly related
  // plus hash noise so corr is high but not 1; grouped into 3 keys.
  private def fixture(parts: Int): DataFrame =
    spark.range(0, 300).repartition(parts)
      .select((col("id") % 3).as("g"),
        (col("id") % 97).cast("long").as("x"),
        ((col("id") % 97) * 2 + pmod(hash(col("id")), lit(13))).cast("long").as("y"))

  private def moments(df: DataFrame): DataFrame =
    df.groupBy("g").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))

  test("corrFromSums matches Spark's corr aggregate within fp tolerance") {
    val ours = moments(fixture(4))
      .select(col("g"), corrFromSums(col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy")).as("r"))
      .as[(Long, Double)].collect().toMap
    val ref = fixture(4).groupBy("g")
      .agg(corr(col("x").cast("double"), col("y").cast("double")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(ours.keySet == ref.keySet)
    ours.foreach { case (g, r) =>
      assert(math.abs(r - ref(g)) < 1e-6, s"group $g: $r vs ${ref(g)}")
      assert(r >= -1.0 && r <= 1.0)
    }
  }

  test("results are bit-identical under any partitioning (Spark's corr is not)") {
    def run(parts: Int): Map[Long, (Double, Double, Double, Double)] =
      moments(fixture(parts)).select(col("g"),
        corrFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")),
        round(slopeFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")), 6),
        round(interceptFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")), 6),
        r2FromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")))
        .as[(Long, Double, Double, Double, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(run(1) == run(13)) // exact ==, not tolerance
  }

  test("translation law: r and slope EXACTLY invariant under integer shifts") {
    // cov and var numerators are algebraically invariant under x+c, y+d,
    // and in INTEGER arithmetic the invariance is exact — so the derived
    // doubles must be bit-identical, not merely close. (The scale law
    // corr(ax, y) = corr(x, y) is NOT exact in fp — sqrt re-rounds — so
    // only the translation law gets an == assertion.)
    val rows = for (g <- 0 until 40; i <- 0 until 25) yield {
      val x = ((g * 31 + i * 17) % 101).toLong
      val y = 2 * x + (i * i % 13)
      (g.toLong, x, y, (g * 997 % 5000 - 2500).toLong, (g * 773 % 3000 - 1500).toLong)
    }
    val df = rows.toDF("g", "x", "y", "cx", "cy")
    def mom(xc: org.apache.spark.sql.Column, yc: org.apache.spark.sql.Column,
            p: String) = Seq(
      sum(xc).as(s"sx$p"), sum(yc).as(s"sy$p"), sum(xc * yc).as(s"sxy$p"),
      sum(xc * xc).as(s"sxx$p"), sum(yc * yc).as(s"syy$p"))
    val m = df.groupBy("g").agg(count(lit(1)).as("n"),
      (mom(col("x"), col("y"), "0") ++
        mom(col("x") + col("cx"), col("y") + col("cy"), "1")): _*)
    val out = m.select(
      corrFromSums(col("n"), col("sx0"), col("sy0"), col("sxy0"), col("sxx0"), col("syy0")).as("r0"),
      corrFromSums(col("n"), col("sx1"), col("sy1"), col("sxy1"), col("sxx1"), col("syy1")).as("r1"),
      slopeFromSums(col("n"), col("sx0"), col("sy0"), col("sxy0"), col("sxx0")).as("b0"),
      slopeFromSums(col("n"), col("sx1"), col("sy1"), col("sxy1"), col("sxx1")).as("b1"))
      .as[(Double, Double, Double, Double)].collect()
    assert(out.length == 40)
    out.foreach { case (r0, r1, b0, b1) =>
      assert(r0 == r1, s"corr moved under translation: $r0 vs $r1")
      assert(b0 == b1, s"slope moved under translation: $b0 vs $b1")
    }
  }

  test("OLS on exactly linear data: slope/intercept/r2 recovered exactly") {
    val lin = spark.range(1, 50).select(lit(0L).as("g"),
      col("id").as("x"), (col("id") * 2 + 3).as("y"))
    val m = moments(lin)
    val out = m.select(
      slopeFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")),
      interceptFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")),
      r2FromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")))
      .as[(Double, Double, Double)].head()
    assert(out == ((2.0, 3.0, 1.0)))
  }

  test("zero-variance group yields NULL, not a crash or Infinity") {
    val const = Seq((0L, 5L, 1L), (0L, 5L, 2L)).toDF("g", "x", "y")
    val out = moments(const).select(
      corrFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")),
      slopeFromSums(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx")))
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("zscore: hand-checked values, and group mean of z is ~0") {
    // x = {2, 4, 6}: mean 4, sample std 2 → z = {-1, 0, 1} exactly
    val toy = Seq(2L, 4L, 6L).toDF("x").withColumn("g", lit(0L))
    val m = toy.groupBy("g").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
    val z = toy.join(m, "g")
      .select(zscoreFromSums(col("x"), col("n"), col("sx"), col("sxx")))
      .as[Double].collect().sorted
    assert(z.sameElements(Array(-1.0, 0.0, 1.0)))
    // singleton group → NULL (n < 2)
    val one = Seq(7L).toDF("x").withColumn("g", lit(0L))
    val m1 = one.groupBy("g").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
    assert(one.join(m1, "g")
      .select(zscoreFromSums(col("x"), col("n"), col("sx"), col("sxx")))
      .collect().head.isNullAt(0))
  }

  test("pmi is exactly 0 for an independent joint distribution") {
    // 2x2 uniform: every cell cnt=5, margins 10, n=20 → ln(5*20/(10*10)) = ln(1)
    val joint = Seq(("a", "u", 5L), ("a", "v", 5L), ("b", "u", 5L), ("b", "v", 5L))
      .toDF("l", "s", "cnt")
    val out = joint.select(pmiFromCounts(col("cnt"), lit(10L), lit(10L), lit(20L)))
      .as[Double].collect()
    assert(out.forall(_ == 0.0))
  }

  test("q135 MAD gate flags a planted outlier and nothing else") {
    // spread base (med=101, MAD=3 → gate at dev>6) plus one far outlier
    val lens = Seq(96L, 98L, 100L, 102L, 104L, 500L)
    val docs = lens.zipWithIndex.map { case (l, i) => (i.toLong, "en", l) }
      .toDF("doc_id", "lang", "x")
    val med = docs.groupBy("lang").agg(expr("percentile(x, 0.5)").as("med"))
    val dev = docs.join(med, "lang")
      .withColumn("dev", abs(col("x").cast("double") - col("med")))
    val mad = dev.groupBy("lang").agg(expr("percentile(dev, 0.5)").as("mad"))
    val flagged = dev.join(mad, "lang").filter(col("dev") > col("mad") * 2.0)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(5L))
  }

  test("grouping sets emits exactly the two marginals with correct flags") {
    val out = SparkEntry.queries("q137_grouping_sets")(spark, sf)
    val rows = out.select("lang", "source", "g_lang", "g_source")
      .as[(String, String, Long, Long)].collect()
    val langs = rows.filter(r => r._3 == 0 && r._4 == 1)
    val sources = rows.filter(r => r._3 == 1 && r._4 == 0)
    assert(langs.length + sources.length == rows.length) // no (0,0)/(1,1) rows
    assert(langs.forall(r => r._1 != null && r._2 == null))
    assert(sources.forall(r => r._1 == null && r._2 != null))
    // marginal totals both sum to the corpus size
    val n = SparkEntrySpecHelpers.docCount(spark, sf)
    val sums = out.groupBy("g_lang").agg(sum("n_docs").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(sums(0L) == n && sums(1L) == n)
  }

  test("histogram counts partition the corpus; buckets within range") {
    val out = SparkEntry.queries("q138_length_histogram")(spark, sf)
    val total = out.agg(sum("n_docs")).as[Long].head()
    assert(total == SparkEntrySpecHelpers.docCount(spark, sf))
    val rows = out.select("bucket", "bucket_lo").as[(Long, Long)].collect()
    assert(rows.forall { case (b, lo) => b >= 0 && b <= 15 && lo == b * 64 })
  }

  test("equi-depth histogram: buckets partition each group, boundaries ordered") {
    val out = SparkEntry.queries("q139_equidepth_histogram")(spark, sf)
      .select("lang", "q1", "q2", "q3", "n_docs", "n_b1", "n_b2", "n_b3", "n_b4")
      .as[(String, Double, Double, Double, Long, Long, Long, Long, Long)]
      .collect()
    assert(out.length == 5)
    out.foreach { case (lang, q1, q2, q3, n, b1, b2, b3, b4) =>
      assert(q1 <= q2 && q2 <= q3, s"$lang boundaries out of order")
      assert(b1 + b2 + b3 + b4 == n, s"$lang buckets don't partition")
      // equi-depth up to tie granularity: no bucket hogs over half
      Seq(b1, b2, b3, b4).foreach(b => assert(b > 0 && b <= n / 2 + 1))
    }
  }

  test("weighted median: hand-checked toy; unit weights degrade to plain median") {
    import org.apache.spark.sql.expressions.Window
    // x = {1, 2, 10}, w = {1, 1, 10}: weighted median = 10 (token mass
    // concentrated in the long doc), plain median = 2
    def wmed(rows: Seq[(Long, Long)]): Long = {
      val d0 = rows.zipWithIndex
        .map { case ((x, w), i) => ("g", i.toLong, x, w) }
        .toDF("lang", "doc_id", "x", "w")
      val w = Window.partitionBy("lang").orderBy(col("x"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d0.withColumn("cw", sum("w").over(w))
        .join(d0.groupBy("lang").agg(sum("w").as("t")), "lang")
        .filter(col("cw") * 2 >= col("t"))
        .agg(min("x")).as[Long].head()
    }
    assert(wmed(Seq((1L, 1L), (2L, 1L), (10L, 10L))) == 10L)
    assert(wmed(Seq((1L, 1L), (2L, 1L), (10L, 1L))) == 2L) // unit weights
    // and the gated query itself: median lies inside the data range,
    // p90 dominates it, and the bisection arms agree everywhere
    val out = SparkEntry.queries("q156_weighted_median")(spark, sf)
      .select("lang", "weighted_median", "weighted_p90", "bisect_matches")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.length == 5 && out.forall(r => r._2 > 0))
    assert(out.forall(r => r._3 >= r._2), "p90 below the median")
    assert(out.forall(_._4), "bisection drifted from the window formulation")
  }

  test("bisection weighted median: exact on toys, negatives, zero weights, " +
    "partitioning-invariant on the fixture") {
    import graft.operators.IntStats
    def bmed(rows: Seq[(String, Long, Long)]): Map[String, Long] = {
      val df = rows.toDF("k", "x", "w")
      IntStats.weightedMedianBisect(df, col("k"), col("x"), col("w"))
        .select("k", "weighted_median").as[(String, Long)].collect().toMap
    }
    assert(bmed(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 10L, 10L))) ==
      Map("a" -> 10L))
    assert(bmed(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 10L, 1L))) ==
      Map("a" -> 2L))
    // negative value domain (floorDiv bisection) + per-key independence
    assert(bmed(Seq(("n", -10L, 1L), ("n", -5L, 1L), ("n", 100L, 1L),
      ("p", 7L, 3L))) == Map("n" -> -5L, "p" -> 7L))
    // all-zero weights: min x (the window formulation's contract)
    assert(bmed(Seq(("z", 4L, 0L), ("z", 9L, 0L))) == Map("z" -> 4L))
    // single value converges without rounds
    assert(bmed(Seq(("s", 42L, 5L))) == Map("s" -> 42L))
    // general rational quantile: p90 of unit weights over 1..10 is 9
    // (cumw(9)=9 ≥ 0.9·10, cumw(8)=8 < 9)
    val p90 = IntStats.weightedQuantileBisect(
      (1L to 10L).map(v => ("g", v, 1L)).toDF("k", "x", "w"),
      col("k"), col("x"), col("w"), 9L, 10L)
      .select("weighted_q").as[Long].head()
    assert(p90 == 9L)
    // randomized differential vs a driver-side reference: 300 rows,
    // negative domain, zero weights, four quantiles incl. the 0/1 edges
    val rnd = new scala.util.Random(12345)
    val rows = (1 to 300).map(_ => ("g" + rnd.nextInt(3),
      (rnd.nextInt(20001) - 10000).toLong, rnd.nextInt(5).toLong))
    val quants = Seq((1L, 2L), (9L, 10L), (0L, 1L), (1L, 1L))
    def ref(g: String, numer: Long, denom: Long): Long = {
      val xs = rows.filter(_._1 == g).map(t => (t._2, t._3)).sortBy(_._1)
      val tw = xs.map(_._2).sum
      var cw = 0L
      xs.find { case (_, wt) => cw += wt; denom * cw >= numer * tw }
        .map(_._1).getOrElse(xs.head._1)
    }
    val got = IntStats.weightedQuantilesBisect(rows.toDF("k", "x", "w"),
      col("k"), col("x"), col("w"), quants)
      .select("k", "weighted_qs").as[(String, Seq[Long])].collect().toMap
    (0 to 2).map("g" + _).foreach { g =>
      quants.zipWithIndex.foreach { case ((n, d), qi) =>
        assert(got(g)(qi) == ref(g, n, d),
          s"$g q=$n/$d: got ${got(g)(qi)} want ${ref(g, n, d)}")
      }
    }
    // fixture: equals the window arm at any input partitioning
    val d0 = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").cast("long").as("x"),
        size(graft.llm.TextOps.lowerTokens(col("text"))).cast("long").as("w"))
    val a = IntStats.weightedMedianBisect(d0, col("lang"), col("x"), col("w"))
      .as[(String, Long, Long)].collect().toSet
    val b = IntStats.weightedMedianBisect(d0.repartition(13),
      col("lang"), col("x"), col("w"))
      .as[(String, Long, Long)].collect().toSet
    assert(a == b && a.size == 5)
  }

  test("approx-seeded bisection: endpoint guard survives an adversarial bracket") {
    import graft.operators.IntStats
    // seeded path on clean unit-weight data: bit-identical to unseeded
    val clean = (1L to 100L).map(v => ("g", v, 1L)).toDF("k", "x", "w")
    val qsM = Seq((1L, 2L), (9L, 10L))
    def run(df: DataFrame, seeded: Boolean): Seq[Long] =
      IntStats.weightedQuantilesBisect(df, col("k"), col("x"), col("w"),
        qsM, unitWeightApproxSeed = seeded)
        .select("weighted_qs").as[Seq[Long]].head()
    assert(run(clean, seeded = true) == run(clean, seeded = false))
    // ADVERSARIAL bracket (round-14 advice): null x rows are invisible
    // to percentile_approx but counted in tw, so the sketch's bracket
    // provably excludes the exact loop's answer — the endpoint guard
    // must detect the violation, fall back to [min, max], and land on
    // the same value the unseeded path computes.
    val rows: Seq[(String, java.lang.Long, Long)] =
      (1L to 6L).map(v => ("g", java.lang.Long.valueOf(v), 1L)) ++
        Seq.fill(4)(("g", null.asInstanceOf[java.lang.Long], 1L))
    val withNulls = rows.toDF("k", "x", "w")
    assert(run(withNulls, seeded = true) == run(withNulls, seeded = false))
  }

  test("length buckets: octile sizes balanced, rank endpoints correct") {
    val out = SparkEntry.queries("q136_length_buckets")(spark, sf)
    val sizes = out.groupBy("lang", "bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      .as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 1), s"ntile imbalance: ${sizes.mkString(",")}")
    val pr = out.groupBy("lang").agg(min("pr").as("lo"), max("pr").as("hi"))
      .as[(String, Double, Double)].collect()
    assert(pr.forall(r => r._2 == 0.0 && r._3 == 1.0))
  }

  test("gini: hand-computed inequality grades; equality is exactly 0") {
    val df = Seq(("a", 0L), ("a", 0L), ("a", 10L), // G = 2/3
      ("b", 5L), ("b", 5L), // perfect equality
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 9L)) // G = 3/4
      .toDF("g", "v")
    val out = graft.operators.IntStats.giniByGroup(df, col("g"), col("v"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out == Map("a" -> 666666L, "b" -> 0L, "c" -> 750000L),
      out.toString)
  }

  test("KS: identical samples D=0; disjoint samples D=1; hand-computed " +
    "intermediate; one-sided groups dropped") {
    import graft.operators.IntStats
    // g=a: identical multisets both sides → D = 0
    // g=b: side1 = {1,2}, side2 = {10,20} — disjoint → D = 1
    // g=c: side1 = {1,2,3}, side2 = {2,3,3}: ECDFs at v=1: |1/3-0|=1/3;
    //      v=2: |2/3-1/3|=1/3; v=3: 0 → D = 1/3 (d_num = 3, n1·n2 = 9)
    // g=d: only one side present → dropped
    val df = Seq(
      ("a", true, 1L), ("a", true, 2L), ("a", false, 1L), ("a", false, 2L),
      ("b", true, 1L), ("b", true, 2L), ("b", false, 10L), ("b", false, 20L),
      ("c", true, 1L), ("c", true, 2L), ("c", true, 3L),
      ("c", false, 2L), ("c", false, 3L), ("c", false, 3L),
      ("d", true, 5L)).toDF("g", "s", "v")
    val out = IntStats.ksByGroup(df, col("g"), col("s"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(out == Map("a" -> ((0L, 0L)), "b" -> ((4L, 1000000L)),
      "c" -> ((3L, 333333L))), out.toString)
  }

  test("trimmed mean: 20% trim drops exactly one from each tail of 5") {
    val df = Seq.tabulate(5)(i => ("g", Seq(1L, 2L, 3L, 4L, 100L)(i)))
      .toDF("g", "v")
    val out = graft.operators.IntStats.trimmedMeanByGroup(df, col("g"), col("v"),
        alphaPct = 20)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(out == (("g", 5L, 1L, 9L, 3000000L)), out.toString)
    // 10% of 5 floors to 0: nothing trimmed, the outlier stays
    val all = graft.operators.IntStats.trimmedMeanByGroup(df, col("g"), col("v"),
        alphaPct = 10)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(all._3 == 0L && all._5 == 22000000L, all.toString)
  }
}

/** Tiny helpers shared by stats suites. */
object SparkEntrySpecHelpers {
  def docCount(spark: org.apache.spark.sql.SparkSession, sf: String): Long =
    graft.sources.Tables.documents(spark, sf).count()
}
