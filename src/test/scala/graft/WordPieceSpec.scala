package graft

import org.apache.spark.sql.functions._

import graft.llm.WordPiece

/** WordPiece tokenizer: likelihood-scored trainer decision table,
  * greedy longest-match-first encoder rules, expression ≡ library,
  * artifact provenance. */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------- trainer

  test("trainer: likelihood score beats raw frequency") {
    // "ab" appears 10× (a:10+2 with "ac"... construct:) corpus:
    //   "ab" ×10, "cd" ×3, "ce" ×7, "cf" ×8
    // pairs: (a,##b) c=10, (c,##d) c=3, (c,##e) c=7, (c,##f) c=8
    // sym counts: a=10, ##b=10, c=18, ##d=3, ##e=7, ##f=8
    // scores: (a,##b) 10/100 = 0.100; (c,##d) 3/54 = 0.056;
    //         (c,##e) 7/126 = 0.056; (c,##f) 8/144 = 0.056
    // → likelihood picks (a,##b) FIRST even though it is not the only
    //   candidate, and picks it over (c,##f) which a frequency scorer
    //   would rank ABOVE (c,##d).
    val freq = Map("ab" -> 10L, "cd" -> 3L, "ce" -> 7L, "cf" -> 8L)
    val merges = WordPiece.train(freq, 1)
    assert(merges == Seq(("a", "##b")))
  }

  test("trainer: exclusive pair beats frequent-but-promiscuous pair") {
    // (x,##y) occurs 3× and x,##y occur NOWHERE else → score 3/9=1/3.
    // (t,##h) occurs 20× but t also precedes ##o 20× → score
    // 20/(40*20)=1/40. WordPiece merges the exclusive pair first; a
    // frequency scorer (BPE) would pick (t,##h).
    val freq = Map("xy" -> 3L, "th" -> 20L, "to" -> 20L)
    val merges = WordPiece.train(freq, 1)
    assert(merges == Seq(("x", "##y")))
  }

  test("trainer: merged symbol drops the right ## and chains") {
    // single word "abc" ×5: first merge joins two of (a,##b),(##b,##c)
    // — scores: (a,##b): 5/25; (##b,##c): 5/25 → tie, lexicographic
    // picks ("##b","##c") < ("a","##b")? '#' < 'a' so yes.
    // After merging → symbols (a, ##bc); second merge joins them into
    // "abc".
    val freq = Map("abc" -> 5L)
    val merges = WordPiece.train(freq, 5)
    assert(merges == Seq(("##b", "##c"), ("a", "##bc")))
    val rows = WordPiece.vocabRows(freq, merges)
    assert(rows.map(_._2) ==
      Seq("[UNK]", "##b", "##c", "a", "##bc", "abc"))
  }

  test("trainer: a pair seen once never merges (economy rule)") {
    val freq = Map("qz" -> 1L)
    assert(WordPiece.train(freq, 5).isEmpty)
  }

  // ---------------------------------------------------------- encoder

  test("encoder: greedy longest match with ## continuations") {
    val pieces = Set("un", "##aff", "##able", "##ff", "##a", "u", "##n",
      "##b", "##l", "##e", "aff")
    // "unaffable": longest prefix "un"; at pos 2 "##aff" (not "##a");
    // at pos 5 "##able"
    assert(WordPiece.encodeWord("unaffable", pieces, 5).toSeq ==
      Seq("un", "##aff", "##able"))
  }

  test("encoder: all-or-nothing — unmatched tail collapses the word") {
    val pieces = Set("un", "##aff") // nothing covers "able"
    assert(WordPiece.encodeWord("unaffable", pieces, 5).toSeq ==
      Seq("[UNK]"))
  }

  test("encoder: word-start piece never matches mid-word and vice versa") {
    val pieces = Set("ab", "##ab")
    // "abab" → "ab" at start, "##ab" as continuation
    assert(WordPiece.encodeWord("abab", pieces, 2).toSeq ==
      Seq("ab", "##ab"))
    // remove the continuation form → tail unmatched → [UNK]
    assert(WordPiece.encodeWord("abab", Set("ab"), 2).toSeq == Seq("[UNK]"))
    // remove the start form → head unmatched → [UNK]
    assert(WordPiece.encodeWord("abab", Set("##ab"), 2).toSeq == Seq("[UNK]"))
  }

  test("encoder: over-length word is [UNK] whole") {
    val w = "a" * (WordPiece.MaxWordChars + 1)
    assert(WordPiece.encodeWord(w, Set("a", "##a"), 1).toSeq == Seq("[UNK]"))
  }

  test("encoder: astral text matches on the code-point grid") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 units
    // a vocab covering the astral char matches it as ONE symbol
    val pieces = Set("a", s"##$clef", "##b")
    assert(WordPiece.encodeWord(s"a${clef}b", pieces, 1).toSeq ==
      Seq("a", s"##$clef", "##b"))
    // MaxWordChars counts code points, not UTF-16 units: a word of
    // exactly MaxWordChars astral chars (2×units) still encodes
    val w = clef * WordPiece.MaxWordChars
    assert(WordPiece.encodeWord(w, Set(clef, s"##$clef"), 1).length ==
      WordPiece.MaxWordChars)
    // ... and one more code point collapses to [UNK]
    assert(WordPiece.encodeWord(w + clef, Set(clef, s"##$clef"), 1).toSeq ==
      Seq("[UNK]"))
  }

  test("expression ≡ library on the fixture corpus, and the checked-in " +
    "artifact reproduces from its declared corpus") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001").limit(50)
    val viaExpr = docs
      .select(col("doc_id"), call_function("wordpiece_encode", col("text")).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    val viaLib = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> (if (t == null) null else WordPiece.encode(t).toSeq) }.toMap
    assert(viaExpr == viaLib.filter(_._2 != null))
    // provenance: trainFromCorpus on the declared corpus == artifact
    val trained = WordPiece.trainFromCorpus(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
      col("text")).as[(Long, String)].collect().toSeq
    val artifact = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(WordPiece.VocabResource), "UTF-8")
      .getLines().drop(1).map { ln =>
        val a = ln.split("\t", -1); (a(0).toLong, a(1)) }.toSeq
    assert(trained == artifact)
  }
}
