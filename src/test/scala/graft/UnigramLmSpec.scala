package graft

import org.apache.spark.sql.functions._
import graft.llm.UnigramLm

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("viterbi: whole-piece segmentation beats char-split; backtrack exact") {
    val cnt = Map("ab" -> 10L, "a" -> 5L, "b" -> 5L, "c" -> 2L)
    // [ab, c] = ln10+ln2-2lnT  >  [a, b, c] = ln5+ln5+ln2-3lnT
    assert(UnigramLm.viterbi("abc", cnt, 22L, 8) == Seq("ab", "c"))
    assert(UnigramLm.viterbi("abab", cnt, 22L, 8) == Seq("ab", "ab"))
    assert(UnigramLm.viterbi("", cnt, 22L, 8) == Nil)
    // unknown-only path must fail loudly, not mis-segment
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi("xyz", cnt, 22L, 8)
    }
  }

  test("astral text segments on the code-point grid: one <unk> per " +
    "supplementary character, never two lone surrogates") {
    val cnt = Map("a" -> 5L, "b" -> 5L, "ab" -> 10L)
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 units
    // the unknown astral char is ONE piece; neighbors segment normally
    assert(UnigramLm.viterbiSafe(s"a${clef}b", cnt, 20L, 8) ==
      Seq("a", UnigramLm.UnkPiece, "b"))
    // a vocab piece CONTAINING an astral char is matched whole
    val cnt2 = cnt + (s"x$clef" -> 7L)
    assert(UnigramLm.viterbiSafe(s"x$clef", cnt2, 27L, 8) == Seq(s"x$clef"))
    // seed extraction counts code points: no lone-surrogate seed pieces
    val seed = UnigramLm.substrCounts(Seq((s"a$clef", 1L)), 2)
    assert(seed.keySet == Set("a", clef, s"a$clef"), seed.keySet.toString)
  }

  test("seed counts weight overlapping substrings by word frequency") {
    val seed = UnigramLm.substrCounts(Seq(("aba", 3L), ("b", 2L)), 2)
    // 'a' occurs twice in aba: 2*3; 'b' once in aba + the word b: 3+2
    assert(seed("a") == 6L && seed("b") == 5L)
    assert(seed("ab") == 3L && seed("ba") == 3L && !seed.contains("aba"))
  }

  test("EM keeps whole frequent words as pieces; rare chars survive " +
    "with the coverage floor") {
    val docs = Seq.fill(30)("column scan column").zipWithIndex
      .map { case (t, i) => (i.toLong, t + (if (i == 0) " q" else "")) }
      .toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, col("text"), vocabSize = 50)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(vocab("column") == 60L)   // 2 per doc × 30 docs
    assert(vocab("scan") == 30L)
    assert(vocab.contains("q"))      // singleton char never dies
  }

  test("encode: pieces rebuild the words; unknown chars surface as <unk>; " +
    "expression matches the library function") {
    val (cnt, tot) = graft.llm.UnigramLm.artifact
    // pieces concatenate back to the input (no unks on corpus words)
    val toks = graft.llm.UnigramLm.encode("window scan window")
    assert(toks.mkString == "windowscanwindow")
    assert(toks.count(_ == "window") == 2)
    // a character absent from the vocab becomes its own <unk> piece
    val unk = graft.llm.UnigramLm.encode("scan Ω scan")
    assert(unk.toSeq == Seq("scan", "<unk>", "scan"))
    assert(!cnt.contains("Ω") && tot > 0)
    // the native expression is the same function
    val viaExpr = Seq((1L, "window scan Ωx"))
      .toDF("doc_id", "text")
      .select(call_function("unigram_encode", col("text")).as("p"))
      .as[Seq[String]].head()
    assert(viaExpr == graft.llm.UnigramLm.encode("window scan Ωx").toSeq)
    assert(viaExpr.contains("<unk>"))
  }

  test("provenance: re-training on the declared corpus reproduces the " +
    "checked-in artifact; every corpus word segments under it") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = UnigramLm.train(docs, col("text"))
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val checked = scala.io.Source.fromFile(
      "/root/repo/src/main/resources/graft/unigram_vocab.tsv").getLines()
      .drop(1).map { l =>
        val Array(r, p, c, pp) = l.split("\t")
        (r.toLong, p, c.toLong, pp.toLong)
      }.toArray
    assert(trained.toSeq == checked.toSeq)
    // coverage invariant over the real corpus
    val cnt = trained.map(t => t._2 -> t._3).toMap
    val tot = trained.map(_._3).sum
    val words = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect()
    words.foreach { w =>
      val seg = UnigramLm.viterbi(w, cnt, tot, UnigramLm.MaxLen)
      assert(seg.mkString == w)
    }
  }
}
