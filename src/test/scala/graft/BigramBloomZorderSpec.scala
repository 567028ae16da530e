package graft

import org.apache.spark.sql.functions._
import graft.llm.{BigramLm, BloomPrune}
import graft.operators.ZOrder

/** Hand-computed decision tables for the round-6 batch-2 operators:
  * bigram-LM scoring, bloom membership pruning, z-order interleave. */
class BigramBloomZorderSpec extends SparkTestBase {
  import spark.implicits._

  // -------------------------------------------------------- bigram LM

  test("bigram LM: hand-computed add-k cross-entropy") {
    // corpus: d1 = "a b a b", d2 = "a b c"
    // bigrams: d1: (a b)x2, (b a)x1; d2: (a b), (b c)
    // c2: "a b"->3, "b a"->1, "b c"->1 ; c1: a->3, b->2
    // V = {a,b,c,x} = 4 (the vocab counts ALL tokens, incl. d3's lone x)
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = BigramLm.score(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_bigrams", "xent")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val v = 4.0
    def p(c2: Double, c1: Double) = (c2 + 0.5) / (c1 + 0.5 * v)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d1 fold in bigram-sorted order: "a b" then "b a"
    val d1 = -(2.0 * math.log(p(3, 3)) + 1.0 * math.log(p(1, 2))) / 3.0
    val d2 = -(1.0 * math.log(p(3, 3)) + 1.0 * math.log(p(1, 2))) / 2.0
    assert(out(1L) == ((3L, Some(r4(d1)))))
    assert(out(2L) == ((2L, Some(r4(d2)))))
    assert(out(3L) == ((0L, None)), "single-token doc: no bigrams, null xent")
  }

  test("bigram LM: templated text scores lower than shuffled text") {
    val template = (1 to 20).map(_ => "the quick brown fox").mkString(" ")
    val shuffled = "fox the brown quick " * 3 + "quick fox the brown"
    val docs = Seq((1L, template), (2L, template), (3L, template),
      (4L, shuffled)).toDF("doc_id", "text")
    val out = BigramLm.score(docs, col("doc_id"), col("text"))
      .select("doc_id", "xent").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(4L),
      s"common transitions must score lower: ${out(1L)} vs ${out(4L)}")
  }

  test("Kneser-Ney: hand-computed interpolated probabilities") {
    // same corpus as the add-k test. Bigram types: "a b" c2=3,
    // "b a" c2=1, "b c" c2=1; c1: a->3 (N1+(a.)=1), b->2 (N1+(b.)=2);
    // N1+(.b)=1, N1+(.a)=1, N1+(.c)=1; N1+(..)=3; D=0.75.
    // P(b|a) = (max(3-.75,0)*3 + .75*1*1)/(3*3) = 7.5/9
    // P(a|b) = (max(1-.75,0)*3 + .75*2*1)/(2*3) = 2.25/6
    // P(c|b) = same = 2.25/6
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = BigramLm.scoreKneserNey(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_bigrams", "xent")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 7.5 / 9.0; val pBX = 2.25 / 6.0
    val d1 = -(2.0 * math.log(pAB) + 1.0 * math.log(pBX)) / 3.0
    val d2 = -(1.0 * math.log(pAB) + 1.0 * math.log(pBX)) / 2.0
    assert(out(1L) == ((3L, Some(r4(d1)))))
    assert(out(2L) == ((2L, Some(r4(d2)))))
    assert(out(3L) == ((0L, None)), "single-token doc: no bigrams, null xent")
  }

  test("Kneser-Ney: per-history probability mass is exactly 1 " +
    "(discounted seen mass + backoff mass)") {
    // For every history w1: sum_seen max(c12-D,0)/c1 = 1 - D*N1w1/c1 and
    // the backoff term adds D*N1w1/c1 * sum_all Pcont = D*N1w1/c1, so the
    // model is a PROPER distribution — the property add-k only
    // approximates. Recompute the stats the operator derives and check.
    val docs = Seq((1L, "a b a b c a"), (2L, "b c b a"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val inst = docs.select(explode(BigramLm.bigrams(col("text"))).as("bg"))
    val c2 = inst.groupBy("bg").agg(count(lit(1)).as("c2"))
      .as[(String, Long)].collect().toMap
    val hist = c2.groupBy(_._1.split(" ")(0))
    val contCount = c2.keys.groupBy(_.split(" ")(1)).map { case (w, g) => w -> g.size }
    val nbt = c2.size.toDouble
    for ((w1, grams) <- hist) {
      val c1 = grams.values.sum.toDouble
      val n1w1 = grams.size.toDouble
      val seen = grams.map { case (bg, c12) =>
        math.max(c12 - 0.75, 0.0) / c1 +
          0.75 * n1w1 / c1 * (contCount(bg.split(" ")(1)) / nbt)
      }.sum
      val unseenBackoff = 0.75 * n1w1 / c1 *
        contCount.filterNot { case (w2, _) => grams.contains(s"$w1 $w2") }
          .values.sum / nbt
      assert(math.abs(seen + unseenBackoff - 1.0) < 1e-12,
        s"history '$w1' mass ${seen + unseenBackoff}")
    }
  }

  test("Kneser-Ney: templated text still scores lower than shuffled") {
    val template = (1 to 20).map(_ => "the quick brown fox").mkString(" ")
    val shuffled = "fox the brown quick " * 3 + "quick fox the brown"
    val docs = Seq((1L, template), (2L, template), (3L, template),
      (4L, shuffled)).toDF("doc_id", "text")
    val out = BigramLm.scoreKneserNey(docs, col("doc_id"), col("text"))
      .select("doc_id", "xent").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(4L),
      s"common transitions must score lower: ${out(1L)} vs ${out(4L)}")
  }

  // ------------------------------------------------------ bloom prune

  test("bloom: every inserted key tests true; most absent keys test false") {
    val m = 1 << 16; val k = 3
    val keys = (1 to 50).map(i => s"key$i").toDF("key")
    val bits = BloomPrune.buildBits(keys, col("key"), m, k)
    val probeSet = (1 to 200).map(i => s"key$i").toDF("key")
    val out = BloomPrune.mightContain(probeSet, col("key"), bits, m, k)
      .select("key", "bloom_hit").as[(String, Boolean)].collect().toMap
    (1 to 50).foreach(i =>
      assert(out(s"key$i"), s"false negative on inserted key$i"))
    // 150 absent keys, m=65536, 150 set bits: FP rate ~ (150/65536)^3 ~ 1e-8
    val fps = (51 to 200).count(i => out(s"key$i"))
    assert(fps == 0, s"$fps absent keys hit (astronomically unlikely)")
  }

  test("bloom: positions are stable md5 derivations (oracle parity)") {
    val m = 1 << 16
    val out = Seq("abc").toDF("key")
      .select(BloomPrune.positions(col("key"), m, 3).as("ps"))
      .as[Seq[Long]].head()
    val expected = (0 until 3).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"abc#$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16) % m
    }
    assert(out == expected)
  }

  // ---------------------------------------------------------- z-order

  test("zValue interleaves bits (known values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (1023L, 1023L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect().toSeq
    // interleave(3=0b011, 5=0b101): bits x0,y0,x1,y1,x2,y2 = 1,1,1,0,0,1
    //   -> 0b100111 = 39
    assert(out == Seq(0L, 1L, 2L, 3L, 39L, 1048575L))
  }

  test("zValue clusters both dimensions: adjacent z implies nearby (x, y)") {
    val df = (0L until 1024L).map(i => (i % 32, i / 32)).toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y"), 5).as("z"))
    val rows = df.as[(Long, Long, Long)].collect().sortBy(_._3)
    // every 64-row z-run spans at most a 8x8 tile in (x, y)
    rows.grouped(64).foreach { g =>
      val xs = g.map(_._1); val ys = g.map(_._2)
      assert(xs.max - xs.min <= 7 && ys.max - ys.min <= 7,
        s"z-run spans ${xs.max - xs.min} x ${ys.max - ys.min}")
    }
  }

  test("layoutBy sorts by z within partitions and keeps all rows") {
    val df = (0L until 256L).map(i => (i % 16, i / 16)).toDF("x", "y")
    val out = ZOrder.layoutBy(df, col("x"), col("y"), bits = 4,
      numPartitions = 4)
    assert(out.count() == 256)
    val perPart = out
      .select(ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .withColumn("p", spark_partition_id())
      .as[(Long, Int)].collect().groupBy(_._2)
    perPart.values.foreach { zs =>
      val seq = zs.map(_._1).toSeq
      assert(seq == seq.sorted, "z not sorted within a partition")
    }
  }
}
