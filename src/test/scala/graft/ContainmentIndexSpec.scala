package graft

import org.apache.spark.sql.functions._
import graft.llm.{InvertedIndex, MinHashLsh}

/** Decision tables for the containment join and the inverted index. */
class ContainmentIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("containment finds the excerpt the symmetric jaccard join misses") {
    val docs = Seq(
      (1L, "a b c d e"),                 // 4 bigrams, all inside doc 2
      (2L, "a b c d e f g h"),           // 7 bigrams
      (3L, "x y z w")                    // unrelated
    ).toDF("doc_id", "text")
    val sets = MinHashLsh.hashSets(docs, col("doc_id"), col("text"))
    val out = MinHashLsh.containmentJoinFromSets(sets, 4, 5)
      .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "containment")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    // directed: 1-in-2 only (4/4 = 1.0); 2-in-1 is 4/7 < 0.8
    assert(out == Set((1L, 2L, 4L, 4L, 7L, 1.0)))
    // the symmetric join at the same threshold finds nothing:
    // jaccard(1,2) = 4/7
    val sym = MinHashLsh.jaccardJoinFromSets(sets, 4, 5)
    assert(sym.count() == 0, "jaccard 4/7 must not pass 0.8 symmetric")
  }

  test("containment: near-identical docs match in both directions") {
    val docs = Seq(
      (1L, "p q r s t"),
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val out = MinHashLsh.containmentJoinFromSets(
        MinHashLsh.hashSets(docs, col("doc_id"), col("text")), 4, 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 1L)), s"got $out")
  }

  test("containment candidates match the naive directed join on random docs") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 40L).map { i =>
      (i, (1 to (2 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = MinHashLsh.containmentJoinFromSets(
        MinHashLsh.hashSets(df, col("doc_id"), col("text")), 3, 4)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    // driver-side brute force over raw bigram sets
    def grams(t: String): Set[String] = {
      val ws = t.split("\\s+")
      if (ws.length < 2) Set.empty
      else ws.sliding(2).map(_.mkString(" ")).toSet
    }
    val gm = docs.map { case (i, t) => i -> grams(t) }.toMap
    val want = (for {
      (a, ga) <- gm.toSeq; (b, gb) <- gm.toSeq
      if a != b && ga.nonEmpty
      shared = (ga intersect gb).size
      if shared * 4 >= ga.size * 3
    } yield (a, b, math.rint(shared.toDouble / ga.size * 1e4) / 1e4)).toSet
    assert(out == want, s"engine ${out.size} vs naive ${want.size} pairs")
  }

  test("inverted index: positions, tf, and df bounds") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "a cat and a cat")).toDF("doc_id", "text")
    val out = InvertedIndex.postings(docs, col("doc_id"), col("text"),
        minDf = 2, maxDf = 2)
      .select("term", "doc_id", "tf", "positions")
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // df: the->2, cat->2, sat->2, on/mat/dog/and/a->1 each
    assert(out.keySet.map(_._1) == Set("the", "cat", "sat"))
    assert(out(("the", 1L)) == ((2L, Seq(1L, 5L))))
    assert(out(("the", 2L)) == ((1L, Seq(1L))))
    assert(out(("cat", 3L)) == ((2L, Seq(2L, 5L))))
    assert(out(("sat", 1L)) == ((1L, Seq(3L))))
  }

  test("inverted index positions reconstruct each document") {
    val docs = Seq((1L, "w1 w2 w3 w2 w1")).toDF("doc_id", "text")
    val out = InvertedIndex.postings(docs, col("doc_id"), col("text"),
        minDf = 1, maxDf = 10)
      .select("term", "positions").as[(String, Seq[Long])].collect()
    val rebuilt = out.flatMap { case (t, ps) => ps.map(_ -> t) }
      .sortBy(_._1).map(_._2).toSeq
    assert(rebuilt == Seq("w1", "w2", "w3", "w2", "w1"))
  }
}
