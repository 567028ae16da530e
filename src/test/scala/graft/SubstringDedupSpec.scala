package graft

import org.apache.spark.sql.functions._
import graft.llm.{SubstringDedup, TextOps}

class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  // unique filler that shares no 20-gram with anything else here
  private def filler(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("gram_hashes matches the rolling hash of each k-substring") {
    val text = filler(1, 60)
    val k = 20
    val viaExpr = Seq(Tuple1(text)).toDF("text")
      .select(call_function("gram_hashes", col("text"), lit(k)).as("gh"))
      .as[Seq[Long]].head
    val direct = (0 to text.length - k).map(i =>
      Seq(Tuple1(text.substring(i, i + k))).toDF("t")
        .select(TextOps.rollingHash(col("t"))).as[Long].head)
    assert(viaExpr == direct)
  }

  test("a planted shared run is marked exactly, in both documents") {
    val shared = filler(2, 30)
    val docs = Seq(
      (1L, filler(3, 40) + shared + filler(4, 25)),
      (2L, filler(5, 10) + shared + filler(6, 50)),
      (3L, filler(7, 80))
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, col("doc_id"), col("text"), 20)
      .as[(Long, Long, Long)].collect().toSet
    // the 30-char run yields 11 overlapping windows merging to one
    // exact span at each host's offset; doc 3 is untouched
    assert(spans == Set((1L, 40L, 70L), (2L, 10L, 40L)))
  }

  test("self-repeats count; sub-k runs are invisible; stats zero-fill") {
    val rep = filler(8, 22)
    val short = filler(9, 19) // 19 < k: duplicated but below threshold
    val docs = Seq(
      (1L, rep + filler(10, 30) + rep),      // twice in ONE doc
      (2L, short + filler(11, 30) + short),
      (3L, filler(12, 45))
    ).toDF("doc_id", "text")
    val byDoc = SubstringDedup.stats(docs, col("doc_id"), col("text"), 20)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byDoc(1L) == (2L, 44L), s"got ${byDoc(1L)}")
    assert(byDoc(2L) == (0L, 0L))
    assert(byDoc(3L) == (0L, 0L))
  }

  test("cut_spans removes exactly the given code-point ranges") {
    def cut(text: String, spans: (Long, Long)*): String =
      Seq(Tuple1(text)).toDF("t").select(call_function("cut_spans", col("t"),
        typedlit(spans.map(_._1)), typedlit(spans.map(_._2)))).as[String].head
    assert(cut("hello world", (0L, 6L)) == "world")
    assert(cut("hello world", (5L, 6L)) == "helloworld")
    assert(cut("hello", (0L, 5L)) == "")
    assert(cut("hello") == "hello")
    assert(cut("hello", (2L, 99L)) == "he") // clamped
    // astral chars count once: cut the 2 emoji, keep the ascii
    assert(cut("ab😀😁cd", (2L, 4L)) == "abcd")
  }

  test("cleaned cuts the planted run and passes untouched docs through") {
    val shared = filler(20, 30)
    val a = filler(21, 15)
    val b = filler(22, 12)
    val docs = Seq(
      (1L, a + shared + b),
      (2L, filler(23, 7) + shared),
      (3L, filler(24, 60))
    ).toDF("doc_id", "text")
    val out = SubstringDedup.cleaned(docs, col("doc_id"), "text", 20)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == a + b)
    assert(out(2L) == filler(23, 7))
    assert(out(3L) == filler(24, 60))
  }

  test("adjacent duplicated regions merge into one maximal span") {
    val a = filler(13, 25)
    val b = filler(14, 25)
    val docs = Seq(
      (1L, a + b),                        // a then b contiguously
      (2L, a + filler(15, 30)),           // a elsewhere
      (3L, filler(16, 30) + b)            // b elsewhere
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, col("doc_id"), col("text"), 20)
      .where(col("doc_id") === 1L).as[(Long, Long, Long)].collect()
    // within doc 1 the a-windows and b-windows are adjacent-or-
    // overlapping via the straddling gap < k, merging to [0, 50)
    assert(spans.map(s => (s._2, s._3)).toSet == Set((0L, 50L)))
  }
}
