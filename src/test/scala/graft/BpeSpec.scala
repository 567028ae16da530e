package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe

/** Pins the BPE artifact and the encode loop: the merge table is
  * versioned (regenerating it is a vocab change), and the expression,
  * the library loop, and the DuckDB oracle must all replay the same
  * deterministic semantics. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("checked-in merge table: head order is pinned (vocab is an artifact)") {
    val ranks = Bpe.ranks
    assert(ranks.nonEmpty && ranks.size >= 50)
    // the first merges learned from the sf0.001 fixture — a retrain that
    // reorders these silently re-tokenizes every stored count downstream
    assert(ranks(("e", "r")) == 0)
    assert(ranks(("o", "r")) == 1)
    assert(ranks(("i", "n")) == 2)
    assert(ranks(("o", "w")) == 3)
    assert(ranks(("s", "t")) == 4)
    // ranks are dense and unique
    assert(ranks.values.toSeq.sorted == (0 until ranks.size))
  }

  test("encode partitions each word's code points exactly (lossless)") {
    val rnd = new scala.util.Random(2026)
    val alphabet = "abcdefgh 日本語😀  tr"
    val texts = (1 to 60).map(_ => (1 to (1 + rnd.nextInt(80)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    texts.foreach { t =>
      val toks = Bpe.encode(t)
      assert(toks.mkString("") == Bpe.splitWords(t).mkString(""),
        s"token concat must rebuild the de-whitespaced text: '$t'")
      assert(toks.forall(tok => tok.nonEmpty && !tok.exists(_.isWhitespace)))
    }
  }

  test("encode loop semantics: leftmost min-rank merge, one step at a time") {
    // toy table: rank0 (a,b), rank1 (ab,c), rank2 (c,c)
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("c", "c") -> 2)
    assert(Bpe.encodeWord("abc", ranks).toSeq == Seq("abc"))
    // ccc: only (c,c) applies; leftmost first → [cc, c], then no pair
    assert(Bpe.encodeWord("ccc", ranks).toSeq == Seq("cc", "c"))
    // abcc: (a,b) first (rank 0) → [ab,c,c]; (ab,c) rank1 beats (c,c)
    // rank2 → [abc, c]
    assert(Bpe.encodeWord("abcc", ranks).toSeq == Seq("abc", "c"))
    // no applicable merges → code points
    assert(Bpe.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
    // astral code points are single base symbols
    assert(Bpe.encodeWord("a😀b", ranks).toSeq == Seq("a", "😀", "b"))
  }

  test("bpe_encode expression equals the library loop; counts drive packing") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val viaExpr = docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("bpe_encode", col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (id, text) =>
      assert(viaExpr(id) == Bpe.encode(text).toSeq, s"doc $id diverged")
    }
    // BPE compresses: strictly fewer tokens than code points, at least
    // as many as whitespace words
    docs.filter(_._2.nonEmpty).foreach { case (id, text) =>
      val n = viaExpr(id).length
      assert(n >= Bpe.splitWords(text).length)
      assert(n <= text.codePoints().toArray.count(cp => !Character.isWhitespace(cp)))
    }
  }

  test("token ids: stable vocab mapping, unk=0 for out-of-vocab code points") {
    val ids = Bpe.vocabIds
    assert(ids(Bpe.UnkToken) == 0)
    // every merge output is in-vocab by construction
    Bpe.ranks.foreach { case ((l, r), _) =>
      assert(ids.contains(l + r), s"merge output '$l$r' missing from vocab")
    }
    // ids are dense 0..V-1 and unique
    assert(ids.values.toSeq.sorted == (0 until ids.size))
    // in-vocab text round-trips with no unks; OOV chars map to 0
    val inVocab = Bpe.encodeIds("the sort order window")
    assert(inVocab.nonEmpty && !inVocab.contains(0))
    val oov = Bpe.encodeIds("же") // cyrillic never seen in training
    assert(oov.nonEmpty && oov.forall(_ == 0))
    // expression equals the library mapping
    val viaExpr = Seq((1L, "the sort же order"))
      .toDF("doc_id", "text")
      .select(call_function("bpe_encode_ids", col("text")))
      .as[Seq[Int]].head()
    assert(viaExpr == Bpe.encodeIds("the sort же order").toSeq)
  }

  test("chunkBpe windows the BPE stream with the chunk/stride contract") {
    val docs = Seq((1L, "the sort order merge window table scan " * 8),
      (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val chunks = graft.llm.Chunking.chunkBpe(docs, col("doc_id"),
      col("text"), chunkTokens = 16, stride = 11)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(!chunks.contains(3L)) // zero tokens → no rows
    assert(chunks(2L) == Seq("x"))
    val want = Bpe.encode("the sort order merge window table scan " * 8).toSeq
    val got = chunks(1L)
    val rebuilt = got.init.flatMap(_.split(" ").take(11)) ++ got.last.split(" ")
    assert(rebuilt == want, "stride rebuild must recover the token stream")
  }
}
