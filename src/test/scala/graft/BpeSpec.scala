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

  test("decode round trip: whitespace runs removed, OOV as <unk>, bad ids survive") {
    // in-vocab text: decode(encode_ids(text)) == text minus whitespace
    val t = "the sort  order\nwindow"
    assert(Bpe.decodeIds(Bpe.encodeIds(t)) == "thesortorderwindow")
    // OOV code points render as <unk>, one per UNMERGEABLE symbol
    assert(Bpe.decodeIds(Bpe.encodeIds("же")) == "<unk><unk>")
    // an id outside the vocab (corrupted manifest) decodes, not throws
    assert(Bpe.decodeIds(Array(Int.MaxValue)) == "<unk>")
    // expression path equals the library; null array elements -> unk
    val viaExpr = Seq((1L, "the sort же order")).toDF("doc_id", "text")
      .select(call_function("bpe_decode_ids",
        call_function("bpe_encode_ids", col("text"))))
      .as[String].head()
    assert(viaExpr == Bpe.decodeIds(Bpe.encodeIds("the sort же order")))
    val withNull = spark.range(1)
      .select(call_function("bpe_decode_ids",
        array(lit(5), lit(null).cast("int"), lit(7)))).as[String].head()
    assert(withNull == Bpe.idTokens(5) + "<unk>" + Bpe.idTokens(7))
  }

  test("distributed trainer reproduces the checked-in artifact; caps bound the driver step") {
    import graft.llm.Bpe
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = Bpe.trainFromCorpus(docs, col("text"),
      graft.tools.MakeBpeVocab.NumMerges)
      .as[(Long, String, String)].collect().sortBy(_._1)
    val checkedIn = Bpe.ranks.toSeq
      .map { case ((l, r), rank) => (rank.toLong, l, r) }.sortBy(_._1)
    assert(trained.toSeq == checkedIn,
      "re-training on the declared corpus must reproduce bpe_merges.tsv")
    // the plan: map-combinable word count + TakeOrdered (bounded heap),
    // never a full global sort of the word table
    val plan = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "").groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(1000000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-V must be a bounded heap:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"word count must combine map-side:\n$plan")
    // a tight maxWords changes the result (fewer forms -> different
    // counts) but still trains deterministically
    val capped = Bpe.trainFromCorpus(docs, col("text"), 5, maxWords = 50)
      .as[(Long, String, String)].collect()
    assert(capped.length == 5 && capped.map(_._1).toSeq == (0L until 5L))
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

  test("span corruption: one span per full window, round-trip reconstructs the stream") {
    import graft.llm.SpanCorruption
    val df = Seq(
      (1L, (0 until 50).toArray),  // 2 full windows + a clean 10-token tail
      (2L, (0 until 19).toArray),  // shorter than a window: untouched
      (3L, Array.empty[Int]))
      .toDF("doc_id", "ids")
    val out = SpanCorruption.corrupt(df, col("doc_id"), col("ids"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getLong(5)))).toMap
    val (n1, ns1, masked1, target1, ppm1) = out(1L)
    assert(n1 == 50 && ns1 == 2 && ppm1 == 120000L)
    def ints(s: String): Seq[Int] =
      if (s.isEmpty) Nil else s.split(",").map(_.toInt).toSeq
    val m1 = ints(masked1)
    val t1 = ints(target1)
    // targets: sentinel k then its 3-token span, spans inside their windows
    assert(t1.length == 8 && t1(0) == 1000000 && t1(4) == 1000001)
    assert(t1.slice(1, 4).forall(v => v >= 0 && v < 20), "span 0 in window 0")
    assert(t1.slice(5, 8).forall(v => v >= 20 && v < 40), "span 1 in window 1")
    // round trip: substituting each sentinel with its target span must
    // reconstruct the identity stream (ids = positions)
    val spans = Map(1000000 -> t1.slice(1, 4), 1000001 -> t1.slice(5, 8))
    val rebuilt = m1.flatMap(v => spans.getOrElse(v, Seq(v)))
    assert(rebuilt == (0 until 50), "masked + target must rebuild the doc")
    assert(m1.length == 50 - 6 + 2, "each 3-token span collapses to one sentinel")
    // short and empty docs stay clean
    assert(out(2L) == ((19L, 0L, (0 until 19).mkString(","), "", 0L)))
    assert(out(3L) == ((0L, 0L, "", "", 0L)))
  }
}
