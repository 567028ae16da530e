package graft

import org.apache.spark.sql.functions._
import graft.llm.{Chunking, Splits, TfIdf}

/** Hand-computed decision tables for the round-6 corpus operators:
  * TF-IDF keyword extraction, deterministic weighted reservoir
  * sampling, and token-window chunking. */
class TfIdfSamplingSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------ tf-idf

  private val tfidfDocs = Seq(
    (1L, "a a b"),
    (2L, "a c"),
    (3L, "b b b c")).toDF("doc_id", "text")

  test("tfidf: scores match the hand-computed smoothed idf") {
    val out = TfIdf.topTerms(tfidfDocs, col("doc_id"), col("text"), k = 3)
      .select("doc_id", "term", "tf", "score", "rank")
      .as[(Long, String, Long, Double, Long)].collect().toSet
    // every term has df=2, N=3: idf = ln(4/3) + 1
    val idf2 = math.log(4.0 / 3.0) + 1.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Set(
      (1L, "a", 2L, r6(2 * idf2), 1L),
      (1L, "b", 1L, r6(idf2), 2L),
      // d2: identical scores -> term DESC breaks the tie
      (2L, "c", 1L, r6(idf2), 1L),
      (2L, "a", 1L, r6(idf2), 2L),
      (3L, "b", 3L, r6(3 * idf2), 1L),
      (3L, "c", 1L, r6(idf2), 2L)))
  }

  test("tfidf: k bounds the per-doc rows and rank is dense from 1") {
    val docs = Seq((1L, "v w x y z a b c")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, col("doc_id"), col("text"), k = 3)
      .select("rank").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  // ------------------------------------- weighted reservoir (A-ES)

  /** The operator's key, recomputed independently on the driver. */
  private def aesKey(id: String, w: Double, salt: String = "wrs"): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((id + salt).getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    val m = java.lang.Long.parseLong(hex, 16)
    math.log((m.toDouble + 0.5) / 1152921504606846976.0) / w
  }

  test("weighted sample: picks exactly the top-k A-ES keys per stratum") {
    val rows = (1L to 30L).map(i => (i, if (i % 2 == 0) "even" else "odd",
      (i % 5) + 1L))
    val df = rows.toDF("id", "grp", "w")
    val out = Splits.weightedSample(df, Seq(col("grp")), col("id"),
        col("w"), k = 4)
      .select("grp", "id", "rank").as[(String, Long, Long)]
      .collect().toSet
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (id, _, w) => (-aesKey(id.toString, w.toDouble), -id) }
        .take(4).zipWithIndex
        .map { case ((id, _, _), i) => (g, id, (i + 1).toLong) }
    }.toSet
    assert(out == expected)
  }

  test("weighted sample: deterministic across runs and partitionings") {
    val df = (1L to 50L).map(i => (i, "g", i)).toDF("id", "grp", "w")
    val a = Splits.weightedSample(df, Seq(col("grp")), col("id"),
      col("w"), k = 5).select("id", "rank").as[(Long, Long)].collect().toSet
    val b = Splits.weightedSample(df.repartition(7), Seq(col("grp")),
      col("id"), col("w"), k = 5)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("weighted sample: distinct salts draw distinct samples") {
    val df = (1L to 200L).map(i => (i, "g", 1L)).toDF("id", "grp", "w")
    def ids(salt: String) = Splits.weightedSample(df, Seq(col("grp")),
      col("id"), col("w"), k = 10, salt = salt)
      .select("id").as[Long].collect().toSet
    assert(ids("s1") != ids("s2"))
  }

  // --------------------------------------------------------- chunking

  test("chunking: overlapping windows, redundant tail dropped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5"), // n=5, starts 0,2 (s=4 tail is redundant)
      (2L, "a b c d"),        // n=4 <= C at s=0; s=2 window ends at 4 too
      (3L, "x"),              // single token, one chunk
      (4L, "")                // zero tokens -> no rows
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, col("doc_id"), col("text"),
        chunkTokens = 4, stride = 2)
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 3L, "t3 t4 t5"),
      (2L, 0L, 4L, "a b c d"),
      (3L, 0L, 1L, "x")))
  }

  test("chunking: every token position is covered by some chunk") {
    val text = (1 to 103).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, col("doc_id"), col("text"),
        chunkTokens = 40, stride = 30)
      .select("chunk_id", "n_chunk_tokens").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    // starts 0,30,60,90: covered ranges [0,40) [30,70) [60,100) [90,103)
    assert(out == Seq((0L, 40L), (1L, 40L), (2L, 40L), (3L, 13L)))
    val covered = out.map { case (cid, n) => (cid * 30, cid * 30 + n) }
    assert(covered.head._1 == 0 && covered.last._2 == 103 &&
      covered.sliding(2).forall { case Seq((_, e), (s2, _)) => s2 <= e })
  }

  // ------------------------------------------------------ vocab drift

  test("log-odds drift: hand-computed movers and the noise floor") {
    import graft.llm.Drift
    val a = Seq((1L, "x x x y"), (2L, "x y")).toDF("doc_id", "text")
    val b = Seq((3L, "y y y x"), (4L, "y z")).toDF("doc_id", "text")
    // counts: A: x4 y2 (Na 6); B: x1 y4 z1 (Nb 6)
    val out = Drift.logOddsDrift(a, b, col("text"), minCount = 3)
      .select("term", "cnt_a", "cnt_b", "lor")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def lor(ca: Long, cb: Long) = {
      val v = math.log(((ca + 0.5) * 7.0) / ((cb + 0.5) * 7.0))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.keySet == Set("x", "y"), "z (count 1) is under the floor")
    assert(out("x") == ((4L, 1L, lor(4, 1))))
    assert(out("y") == ((2L, 4L, lor(2, 4))))
    assert(out("x")._3 > 0 && out("y")._3 < 0)
  }

  test("log-odds drift is antisymmetric under slice swap") {
    import graft.llm.Drift
    val a = Seq((1L, "p q r p")).toDF("doc_id", "text")
    val b = Seq((2L, "q r s q")).toDF("doc_id", "text")
    val fwd = Drift.logOddsDrift(a, b, col("text"), 1)
      .select("term", "lor").as[(String, Double)].collect().toMap
    val rev = Drift.logOddsDrift(b, a, col("text"), 1)
      .select("term", "lor").as[(String, Double)].collect().toMap
    fwd.foreach { case (t, v) => assert(math.abs(v + rev(t)) < 1e-9) }
  }
}
