package graft

import org.apache.spark.sql.functions._
import graft.llm.{MinHashLsh, SimHash, TextOps}

class LlmTextSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep dark forest where nobody ever goes at night"

  test("minhash-LSH finds an edited near-duplicate, not unrelated text") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")), // one-word edit: high jaccard
      (3L, "completely different content about spark query engines and " +
        "columnar execution with vectorized operators everywhere all day long")
    ).toDF("doc_id", "text")
    val pairs = MinHashLsh.verifiedPairs(docs, col("doc_id"), col("text"), 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("identical texts give identical signatures and jaccard 1.0") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val sigs = MinHashLsh.signatures(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").drop("doc_id").collect()
    assert(sigs(0) == sigs(1))
    val p = MinHashLsh.verifiedPairs(docs, col("doc_id"), col("text"), 0.99)
      .select("jaccard").as[Double].collect().toSeq
    assert(p == Seq(1.0))
  }

  test("simhash hamming distance: small edit close, unrelated text far") {
    val docs = Seq(
      (1L, base), (2L, base.replace("lazy", "sleepy")),
      (3L, "totally unrelated words about database optimizers and join " +
        "reordering strategies in distributed systems running on clusters")
    ).toDF("doc_id", "text")
    val fp = SimHash.fingerprints(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").select("simhash").as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0), fp(1)) < ham(fp(0), fp(2)))
    assert(ham(fp(0), fp(1)) <= 10)
  }

  test("simhash pigeonhole near-pairs finds only close fingerprints") {
    val docs = Seq(
      (1L, base), (2L, base), // identical: hamming 0
      (3L, "x y z " * 20)
    ).toDF("doc_id", "text")
    val fps = SimHash.fingerprints(docs, col("doc_id"), col("text"))
    val pairs = SimHash.nearPairs(fps, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("native minhash_band_keys expression matches the HOF band keys exactly") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(100)
    val sets = MinHashLsh.hashSets(docs, col("doc_id"), col("text"))
    val hof = MinHashLsh.bandedKeys(MinHashLsh.signaturesFromSets(sets))
      .orderBy("doc_id", "band").collect().toSeq
    val native = MinHashLsh.bandedKeysNative(sets)
      .orderBy("doc_id", "band").collect().toSeq
    assert(native == hof)
  }

  test("native word_bigrams expression matches the HOF shingles exactly") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), col("text"))
      // edge shapes the corpus may lack: empty, 1 token, leading/trailing
      // whitespace (empty tokens), repeated bigrams, null text
      .unionByName(Seq(
        (900001L, ""), (900002L, "one"), (900003L, "  a b  "),
        (900004L, "x y x y x"), (900005L, null)
      ).toDF("doc_id", "text"))
    val out = docs.select(
      MinHashLsh.shingles(col("text")).as("native"),
      MinHashLsh.shinglesHof(col("text")).as("hof"),
      col("doc_id"))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"doc ${r.getLong(2)}: native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
  }

  // Edge shapes the corpus may lack: empty, 1 token, leading/trailing
  // whitespace (empty tokens), repeated bigrams/tokens, punctuation,
  // newlines/CR, non-ASCII, null text.
  private def edgeDocs = graft.sources.Tables.documents(spark, sf).limit(200)
    .select(col("doc_id"), col("text"))
    .unionByName(Seq(
      (900001L, ""), (900002L, "one"), (900003L, "  a b  "),
      (900004L, "x y x y x"), (900005L, null),
      (900006L, "Hello, World!\nline two\r\nand\tmore"),
      (900007L, "café über straße  sep")
    ).toDF("doc_id", "text"))

  test("native shingle_hash_set equals the exploded collect_set path as a set") {
    val native = MinHashLsh.hashSets(edgeDocs, col("doc_id"), col("text"))
      .select(col("doc_id"), array_sort(col("hs")).as("hs"))
      .orderBy("doc_id").collect().toSeq
    val agg = MinHashLsh.hashSetsAgg(edgeDocs, col("doc_id"), col("text"))
      .select(col("doc_id"), array_sort(col("hs")).as("hs"))
      .orderBy("doc_id").collect().toSeq
    assert(native.nonEmpty && native == agg)
  }

  test("sorted_intersect_size merge-count equals size(array_intersect)") {
    val sets = MinHashLsh.hashSets(edgeDocs, col("doc_id"), col("text"))
    val pairs = sets.select(col("doc_id").as("a"), col("hs").as("ha"))
      .crossJoin(sets.select(col("doc_id").as("b"), col("hs").as("hb"))
        .filter(col("b") % 10 === 0))
    val out = pairs.select(
      call_function("sorted_intersect_size", col("ha"), col("hb")).as("native"),
      size(array_intersect(col("ha"), col("hb"))).as("generic"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("shingle_hash_set output is sorted ascending (merge-count invariant)") {
    val out = MinHashLsh.hashSets(edgeDocs, col("doc_id"), col("text"))
      .select(col("hs"), array_sort(col("hs")).as("sorted")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("native char_ngram_hash_set equals the HOF substring formulation as a set") {
    import graft.llm.MinHashLsh.P
    val n = 5
    // HOF reference: 1-based code-point substrings, hashed like
    // shingleHash, distinct, sorted (guarded: Spark sequence(1,0) counts
    // DOWN, unlike DuckDB generate_series)
    val hofCol = when(length(col("text")) >= n,
      array_sort(array_distinct(transform(
        sequence(lit(1), length(col("text")) - (n - 1)),
        i => conv(org.apache.spark.sql.functions.substring(md5(col("text").substr(i, lit(n))), 1, 15), 16, 10).cast("long") % P))))
      .otherwise(array().cast("array<long>"))
    // null text: native is null-for-null, the when-otherwise yields [] —
    // both are dropped by charNgramHashSets' size>0 filter, so compare
    // them as empty
    val out = edgeDocs.select(
      col("doc_id"),
      coalesce(call_function("char_ngram_hash_set", col("text"), lit(n)),
        array().cast("array<long>")).as("native"),
      hofCol.as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.get(0)}: native=${r.getSeq[Long](1)} hof=${r.getSeq[Long](2)}")
    }
  }

  test("native simhash60 is bit-identical to the explode+vote aggregation") {
    val native = SimHash.fingerprints(edgeDocs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    val agg = SimHash.fingerprintsAgg(edgeDocs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    assert(native.nonEmpty && native == agg)
  }

  test("native rolling_hash is bit-identical to the regex+fold formulation") {
    val out = edgeDocs.select(
      col("doc_id"),
      TextOps.rollingHash(col("text")).as("native"),
      TextOps.rollingHashHof(col("text")).as("hof")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("native text_stats fields are bit-identical to the regex formulations") {
    val out = edgeDocs.select(
      col("doc_id"),
      struct(
        TextOps.nTokens(col("text")), TextOps.nSubtokens(col("text")),
        TextOps.punctRatio(col("text")), TextOps.stopwordRatio(col("text")),
        TextOps.avgTokenLen(col("text")), TextOps.langId(col("text")),
        TextOps.fingerprint(col("text"))).as("native"),
      struct(
        TextOps.nTokensRegex(col("text")), TextOps.nSubtokensRegex(col("text")),
        TextOps.punctRatioRegex(col("text")), TextOps.stopwordRatioRegex(col("text")),
        TextOps.avgTokenLenRegex(col("text")), TextOps.langIdRegex(col("text")),
        TextOps.fingerprintRegex(col("text"))).as("regex")).collect()
    out.foreach { r =>
      assert(r.getStruct(1) == r.getStruct(2),
        s"doc ${r.getLong(0)}: native=${r.getStruct(1)} regex=${r.getStruct(2)}")
    }
  }

  test("native rep_stats equals the explode+groupBy formulation") {
    import graft.llm.TextOps
    val docs = edgeDocs
      .unionByName(Seq(
        (900010L, "a b a b a b c"),            // "a b" x3 covers 9 chars
        (900011L, "line one\nline one\nother") // duplicated line
      ).toDF("doc_id", "text"))
      .where(col("text").isNotNull)
    // independent reference: explode n-grams / lines, count, aggregate
    def cover(n: Int) = {
      val ws = split(col("text"), "\\s+")
      val grams = when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
      docs.select(col("doc_id"), explode(grams).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(max(col("count") * length(col("g"))).cast("int").as(s"c$n"))
    }
    val dupLines = docs
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("l"))
      .groupBy("doc_id", "l").count()
      .groupBy("doc_id")
      .agg(sum(when(col("count") >= 2, col("count") * length(col("l")))
        .otherwise(0)).cast("int").as("dl"))
    val expect = docs.select(col("doc_id"))
      .join(cover(2), Seq("doc_id"), "left")
      .join(cover(3), Seq("doc_id"), "left")
      .join(dupLines, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("c2"), lit(0)).as("c2"),
        coalesce(col("c3"), lit(0)).as("c3"), coalesce(col("dl"), lit(0)).as("dl"))
      .as[(Long, Int, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val native = docs.select(col("doc_id"), TextOps.repStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.top2_cover"), col("st.top3_cover"),
        col("st.dup_line_chars"))
      .as[(Long, Int, Int, Int)].collect()
    assert(native.nonEmpty)
    native.foreach { case (id, a, b, c) =>
      assert(expect(id) == ((a, b, c)), s"doc $id: native=($a,$b,$c) expect=${expect(id)}")
    }
  }

  test("hash split is deterministic, id-consistent across tables, roughly weighted") {
    import graft.llm.Splits
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = docs.select(col("doc_id"), Splits.split(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    // same ids through a DIFFERENT table shape -> identical assignment
    val b = docs.select(col("doc_id"), col("text"))
      .select(col("doc_id"), Splits.split(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train=${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac.getOrElse("test", 0.0) > 0.03)
  }

  test("hash sample: deterministic, nested within a larger rate, salt-independent") {
    import graft.llm.Splits
    val docs = graft.sources.Tables.documents(spark, sf)
    def ids(perMille: Int, salt: String) = docs
      .filter(Splits.hashSample(col("doc_id"), lit(perMille), salt))
      .select("doc_id").as[Long].collect().toSet
    val s100 = ids(100, "a")
    // deterministic across re-evaluation and repartitioning
    assert(ids(100, "a") == s100)
    assert(docs.repartition(7)
      .filter(Splits.hashSample(col("doc_id"), lit(100), "a"))
      .select("doc_id").as[Long].collect().toSet == s100)
    // same salt nests; rate is roughly honored
    val s500 = ids(500, "a")
    assert(s100.subsetOf(s500))
    val n = docs.count().toDouble
    assert(s100.size / n > 0.05 && s100.size / n < 0.15)
    // a different salt draws an (almost surely) different sample
    assert(ids(100, "b") != s100)
  }

  test("vocab stats count tf and df with case folding and df floor") {
    import graft.llm.TextOps
    val docs = Seq(
      (1L, "Spark spark SPARK engine"),
      (2L, "spark engine engine"),
      (3L, "unrelated words only"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.vocabStats(docs, col("doc_id"), col("text"), minDf = 2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map("spark" -> (4L, 2L), "engine" -> (3L, 2L)))
  }

  test("winnowing: a shared >= w+k-1 char run is always detected, unrelated docs are not") {
    import graft.llm.Winnowing
    val shared = "the exact same twenty-three plus character span appears here"
    val docs = Seq(
      (1L, s"prefix text one $shared and a suffix"),
      (2L, s"completely different beginning $shared another ending"),
      (3L, "no overlap with anything else in this corpus at all tonight"),
      (4L, "tiny"), // shorter than k+w-1 -> no fingerprints
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pairs = Winnowing.sharedSpanPairs(docs, col("doc_id"), col("text"),
      minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    val fps = Winnowing.fingerprints(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), coalesce(size(col("fps")), lit(-1)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(fps(4L) == 0 && fps(1L) > 0 && fps(5L) == -1) // null text -> null
    // guarantee check over random pairs: every planted 23-char shared run
    // yields at least one shared fingerprint (w+k-1 = 23 with defaults)
    val rnd = new scala.util.Random(21)
    def randText(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val planted = (1 to 50).flatMap { i =>
      val run = randText(23)
      Seq((i.toLong * 2, s"${randText(40)}$run${randText(40)}"),
        (i.toLong * 2 + 1, s"${randText(40)}$run${randText(40)}"))
    }.toDF("doc_id", "text")
    val found = Winnowing.sharedSpanPairs(planted, col("doc_id"), col("text"),
      minShared = 1, maxDf = 1000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    (1 to 50).foreach { i =>
      assert(found.contains((i.toLong * 2, i.toLong * 2 + 1)),
        s"planted pair $i not detected")
    }
  }

  test("bm25: tf monotone, rarer terms weigh more, non-matching docs absent") {
    import graft.llm.Bm25
    val docs = Seq(
      (1L, "hash join hash probe build side"),  // tf(hash)=2
      (2L, "hash join sort probe build side"),  // tf(hash)=1, same length
      (3L, "vector scan only here today now"),  // rare term
      (4L, "nothing relevant in this doc"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Bm25.score(docs, col("doc_id"), col("text"), Seq("hash", "vector"))
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) > out(2L))         // higher tf, same dl -> higher score
    assert(out(3L) > out(2L))         // df(vector)=1 < df(hash)=2 -> rarer wins
    assert(out.values.forall(_ > 0))
  }

  test("PII redaction replaces emails, IPs and phones with sentinels") {
    val out = Seq(
      "contact me at jane.doe+spam@example.co.uk for details",
      "server at 192.168.001.1 responded",
      "call +1 (415) 555-0199 or 030-1234-5678 today",
      "no pii here at all",
      "mixed: bob@host.org from 10.0.0.1 dialed 555 123 4567",
      "card 4111111111111111 on file",
      "year 2024 revenue")
      .toDF("text").select(TextOps.redactPii(col("text"))).as[String]
      .collect().toSeq
    assert(out(0) == "contact me at <EMAIL> for details")
    assert(out(1) == "server at <IP> responded")
    assert(out(2) == "call <PHONE> or <PHONE> today")
    assert(out(3) == "no pii here at all")
    assert(out(4) == "mixed: <EMAIL> from <IP> dialed <PHONE>")
    // boundary anchors: a 16-digit run can't be a phone — left INTACT,
    // never partially consumed with a fragment after the sentinel
    assert(out(5) == "card 4111111111111111 on file")
    assert(out(6) == "year 2024 revenue")
  }

  test("language ID votes stopwords; unknown when none hit") {
    val out = Seq(
      "the cat is on the mat and it is warm",
      "der hund ist nicht mit der katze",
      "el perro y la casa en un lugar",
      "qwfp zxcv mnbv lkjh")
      .toDF("text").select(TextOps.langId(col("text"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "es", "unknown"))
  }

  test("exact dedup groups normalize case, punctuation, whitespace") {
    val docs = Seq(
      (10L, "Hello,   World! This is FINE."),
      (11L, "hello world this is fine"),
      (12L, "something else entirely")
    ).toDF("doc_id", "text")
    val g = TextOps.exactDuplicateGroups(docs, col("doc_id"), col("text"))
      .orderBy("canonical_doc_id")
      .select("n_docs", "canonical_doc_id").as[(Long, Long)].collect().toSeq
    assert(g == Seq((2L, 10L), (1L, 12L)))
  }

  test("decontamination flags train docs sharing an n-gram run with eval") {
    import graft.llm.Decontamination
    // 8 shared consecutive tokens = exactly one shared 8-gram
    val sharedRun = "alpha bravo charlie delta echo foxtrot golf hotel"
    val train = Seq(
      (1L, s"unrelated prefix words here $sharedRun and a different tail"),
      (2L, "nothing in common with any benchmark document at all " +
        "whatsoever in any way shape or form tonight"),
      (3L, "short text")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, s"benchmark question about $sharedRun with its own suffix")
    ).toDF("doc_id", "text")
    val pairs = Decontamination.contaminationPairs(
      train, col("doc_id"), col("text"), eval, col("doc_id"), col("text"),
      n = 8).select("doc_id", "eval_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 100L, 1L)))
    // removal keeps schema, drops only the contaminated doc
    val clean = Decontamination.decontaminated(
      train, col("doc_id"), col("text"), eval, col("doc_id"), col("text"),
      n = 8)
    assert(clean.columns.toSeq == train.columns.toSeq)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    // 9 shared tokens = two overlapping shared 8-grams
    val nine = sharedRun + " india"
    val p9 = Decontamination.contaminationPairs(
      Seq((7L, s"x $nine y")).toDF("doc_id", "text"), col("doc_id"), col("text"),
      Seq((8L, s"q $nine r")).toDF("doc_id", "text"), col("doc_id"), col("text"),
      n = 8).select("n_shared").as[Long].collect().toSeq
    assert(p9 == Seq(2L))
    // minShared raises the bar
    val strict = Decontamination.contaminationPairs(
      train, col("doc_id"), col("text"), eval, col("doc_id"), col("text"),
      n = 8, minShared = 2).count()
    assert(strict == 0)
  }

  test("semantic decontamination: cross-set only, paraphrase caught, eval side broadcasts") {
    import graft.llm.Decontamination
    val dims = graft.llm.Similarity.Dims
    def vec(seed: Int): Seq[Double] =
      (0 until dims).map(i => math.sin(seed * 31.0 + i)).toSeq
    def near(v: Seq[Double]): Seq[Double] =
      v.zipWithIndex.map { case (x, i) => x + 0.001 * math.cos(i.toDouble) }
    val e1 = vec(1)
    // train: 10 ≈ eval's 100 (the paraphrase leak); 11/12 mutually
    // near-identical (a train-side dup that must NOT be reported);
    // 13 unrelated
    val train = Seq(
      (10L, near(e1)), (11L, vec(2)), (12L, near(vec(2))), (13L, vec(9)))
      .toDF("vec_id", "embedding")
    val evalSet = Seq((100L, e1), (101L, vec(5)))
      .toDF("vec_id", "embedding")
    val rep = Decontamination.semanticReport(train, evalSet, tau = 0.9)
    val rows = rep.select("train_id", "n_hits", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(rows(10L) == ((1L, true)), "paraphrased benchmark doc flagged")
    // 11 ≈ 12 is a train×train pair: the report may list 11/12 only if
    // they bucket-collide with an EVAL vector, and never as contaminated
    rows.get(11L).foreach { case (h, c) => assert(h == 0L && !c) }
    rows.get(12L).foreach { case (h, c) => assert(h == 0L && !c) }
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark-sized eval side must broadcast")
  }

  test("line dedup drops corpus-wide boilerplate, keeps order, handles edge docs") {
    import graft.llm.LineDedup
    val boiler = "accept our cookies to continue"
    val docs = Seq(
      (1L, s"unique first line\n$boiler\nunique last line"),
      (2L, s"$boiler\nanother original thought"),
      (3L, boiler),                       // all-boilerplate -> ''
      (4L, "standalone document"),        // untouched
      (5L, null.asInstanceOf[String]),    // null passes through
      (6L, "para one\n\npara two"),       // blank lines are structure,
      (7L, "intro\n\noutro"))             // not corpus-wide boilerplate
      .toDF("doc_id", "text")
    val out = LineDedup.removeDuplicatedLines(docs, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "unique first line\nunique last line")
    assert(out(2L) == "another original thought")
    assert(out(3L) == "")
    assert(out(4L) == "standalone document")
    assert(out(5L) == null)
    // the empty line occurs in two docs but must NOT be removed
    assert(out(6L) == "para one\n\npara two")
    assert(out(7L) == "intro\n\noutro")
  }

  test("native word_ngram_hash_set is set-identical to the HOF formulation") {
    import graft.llm.Decontamination
    val docs = graft.sources.Tables.documents(spark, sf)
      .unionByName(Seq((90001L, " leading  and   trailing whitespace runs here ok "),
        (90002L, "short"), (90003L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), allowMissingColumns = true)
    for (n <- Seq(2, 8)) {
      val native = Decontamination.ngramHashSet(docs, col("doc_id"), col("text"), n)
        .select(col("doc_id"), col("grams"))
        .as[(Long, Seq[Long])].collect().toMap
      val hof = Decontamination.ngramHashSetHof(docs, col("doc_id"), col("text"), n)
        .select(col("doc_id"), array_sort(col("grams")).as("grams"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native.keySet == hof.keySet)
      native.foreach { case (id, g) =>
        assert(g == hof(id), s"n=$n doc=$id native=$g hof=${hof(id)}") }
    }
  }

  test("unigram surprisal: common text scores low, rare text high, " +
    "empty/null docs null") {
    import graft.llm.TextOps
    val docs = (Seq(
      (1L, "the common words repeat the common words"),
      (2L, "xqzv bnrkt owpfh jjyqe zzztt"), // corpus-unique garbage
      (3L, ""), (4L, null.asInstanceOf[String])) ++
      (5L to 30L).map(i => (i, "the common words appear here too")))
      .toDF("doc_id", "text")
    val out = TextOps.unigramSurprisal(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(3L).isEmpty && out(4L).isEmpty)
    assert(out(1L).get < out(2L).get, s"common ${out(1L)} !< rare ${out(2L)}")
    assert(out.values.flatten.forall(_ > 0)) // -ln(p) of p<1 is positive
  }

  test("sequence packing: greedy fill, oversize isolation, exactly-once, " +
    "one exchange") {
    import graft.llm.Packing
    // one shard so the chain is fully deterministic by id order:
    // 4+4 fit in 10; +4 overflows -> seq 2; 12 oversize -> own seq 3;
    // next 4 -> seq 4 (fill was 12 > budget, must reset)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 12L), (5L, 4L))
      .toDF("doc_id", "nt")
    val out = Packing.packGreedy(docs, col("doc_id"), col("nt"),
      budget = 10L, shards = 1)
      .select("doc_id", "seq_no", "offset")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out == Map(1L -> (1L, 0L), 2L -> (1L, 4L), 3L -> (2L, 0L),
      4L -> (3L, 0L), 5L -> (4L, 0L)))

    // invariants on real data: every doc exactly once; every sequence's
    // total fits the budget unless it is a single oversize document
    val docs2 = graft.sources.Tables.documents(spark, sf)
    val packed = Packing.packGreedy(docs2, col("doc_id"),
      graft.llm.TextOps.nTokens(col("text")), budget = 512L, shards = 8)
    assert(packed.count() == docs2.count())
    assert(packed.select("doc_id").distinct().count() == docs2.count())
    val bad = packed.groupBy("shard", "seq_no")
      .agg(sum("n_tokens").as("total"), count(lit(1)).as("n"))
      .where(col("total") > 512 && col("n") > 1)
    assert(bad.count() == 0, "multi-doc sequence over budget")
    // scale shape: exactly one exchange (the shard repartition)
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"plan:\n$plan")
  }

  test("first-fit-decreasing packing: hand-checked placement, eviction, " +
    "invariants, and fill >= arrival order on the fixture") {
    import graft.llm.Packing
    // budget 10, K=4 open bins, one shard; processing order is nt desc:
    //   9 -> bin1; 8 -> bin2; 7 -> bin3; 6 -> bin4;
    //   5 -> fits nowhere (9+5, 8+5, 7+5, 6+5 all > 10) -> EVICT bin1
    //        (oldest), open bin5;
    //   2 -> first open fit = bin2 (8+2 = 10);
    //   1 -> bin2 full, bin3 7+1 fits -> (bin3, 7)
    val docs = Seq((1L, 9L), (2L, 8L), (3L, 7L), (4L, 6L), (5L, 2L),
      (6L, 1L), (7L, 5L)).toDF("doc_id", "nt")
    val out = Packing.packFirstFit(docs, col("doc_id"), col("nt"),
      budget = 10L, shards = 1)
      .select("doc_id", "seq_no", "offset")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out == Map(1L -> (1L, 0L), 2L -> (2L, 0L), 3L -> (3L, 0L),
      4L -> (4L, 0L), 7L -> (5L, 0L), 5L -> (2L, 8L), 6L -> (3L, 7L)))

    // invariants on real data: exactly-once, budget respected except
    // single oversize docs, and FFD's fill dominates the arrival chain
    val docs2 = graft.sources.Tables.documents(spark, sf)
    val nTok = graft.llm.TextOps.nTokens(col("text"))
    val ffd = Packing.packFirstFit(docs2, col("doc_id"), nTok,
      budget = 256L, shards = 8)
    assert(ffd.count() == docs2.count())
    assert(ffd.select("doc_id").distinct().count() == docs2.count())
    val bad = ffd.groupBy("shard", "seq_no")
      .agg(sum("n_tokens").as("total"), count(lit(1)).as("n"))
      .where(col("total") > 256 && col("n") > 1)
    assert(bad.count() == 0, "multi-doc bin over budget")
    def bins(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy("shard").agg(max("seq_no").as("ns"))
        .as[(Long, Long)].collect().toMap
    val arrival = bins(Packing.packGreedy(docs2, col("doc_id"), nTok,
      budget = 256L, shards = 8))
    bins(ffd).foreach { case (shard, nFfd) =>
      assert(nFfd <= arrival(shard),
        s"shard $shard: FFD opened $nFfd bins vs arrival ${arrival(shard)}")
    }
    // partitioning-invariant (the chain state is per-shard, the order
    // deterministic)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "doc_id", "seq_no", "offset")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows(ffd) == rows(Packing.packFirstFit(docs2.repartition(13),
      col("doc_id"), nTok, budget = 256L, shards = 8)))
    // scale shape: exactly one exchange
    val plan = ffd.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"plan:\n$plan")
  }

  test("sequence assembly conserves the token stream in pack order") {
    import graft.llm.Packing
    val docs = Seq(
      (1L, Seq(10, 11)), (2L, Seq(20)), (3L, Seq(30, 31, 32)),
      (4L, Seq.empty[Int]), (5L, Seq(50)))
      .toDF("doc_id", "ids")
    val out = Packing.assembleSequences(docs, col("doc_id"),
        col("ids"), budget = 3L, shards = 1)
      .orderBy("seq_no")
      .select("seq_no", "n_docs", "tokens")
      .as[(Long, Long, Seq[Int])].collect().toSeq
    // chain at budget 3: doc1(2)+doc2(1) fill seq 1; doc3(3) seq 2;
    // doc4(0)+doc5(1) join... doc4 after doc3: fill 3+0=3 stays seq 2;
    // doc5: 3+1>3 -> seq 3
    assert(out == Seq(
      (1L, 2L, Seq(10, 11, 20)),
      (2L, 2L, Seq(30, 31, 32)), // doc4's empty stream rides along
      (3L, 1L, Seq(50))))
    // a NULL id stream (null-text doc) must not void its sequence:
    // flatten would return NULL if the null array reached it
    val withNull = Seq((1L, Some(Seq(10, 11))), (2L, None), (3L, Some(Seq(30))))
      .toDF("doc_id", "ids")
    val nOut = Packing.assembleSequences(withNull, col("doc_id"),
        col("ids"), budget = 10L, shards = 1)
      .select("seq_no", "n_docs", "tokens")
      .as[(Long, Long, Seq[Int])].collect().toSeq
    assert(nOut == Seq((1L, 3L, Seq(10, 11, 30))),
      "null stream rides along as a member with no tokens")
    // conservation on the fixture: concatenating sequences in
    // (shard, seq_no) order replays every doc's stream exactly once,
    // in doc_id order within each shard
    val docs2 = graft.sources.Tables.documents(spark, sf)
    val ids = call_function("bpe_encode_ids", col("text"))
    val asm = Packing.assembleSequences(docs2, col("doc_id"), ids,
        budget = 256L, shards = 4)
    val replayed = asm.orderBy("shard", "seq_no")
      .select(col("shard"), col("tokens"))
      .as[(Long, Seq[Int])].collect().toSeq
      .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    val want = docs2
      .select(graft.llm.Splits.md5Bucket(col("doc_id").cast("string"), 4)
        .as("shard"), col("doc_id"), ids.as("i"))
      .orderBy("shard", "doc_id")
      .as[(Long, Long, Seq[Int])].collect().toSeq
      .groupBy(_._1).view.mapValues(_.flatMap(_._3)).toMap
    assert(replayed == want)
  }

  test("custom GreedyPack operator is value-identical to the " +
    "mapPartitions formulation (toy chain + full fixture)") {
    import graft.llm.Packing
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "doc_id", "n_tokens", "seq_no", "offset")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 12L), (5L, 4L))
      .toDF("doc_id", "nt")
    assert(rows(Packing.packGreedyPlan(docs, col("doc_id"), col("nt"), 10L, 1))
      == rows(Packing.packGreedy(docs, col("doc_id"), col("nt"), 10L, 1)))
    val docs2 = graft.sources.Tables.documents(spark, sf)
    val nt = graft.llm.TextOps.nTokens(col("text"))
    assert(rows(Packing.packGreedyPlan(docs2, col("doc_id"), nt, 512L, 8))
      == rows(Packing.packGreedy(docs2, col("doc_id"), nt, 512L, 8)))
    // doc_id is contract-wise "any orderable": both formulations must
    // agree on STRING ids too (exec sorts on the child's second column
    // generically, mapPartitions reads it untyped)
    val sdocs = Seq(("d01", 4L), ("d02", 4L), ("d03", 4L), ("d10", 12L))
      .toDF("doc_id", "nt")
    def srows(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "doc_id", "n_tokens", "seq_no", "offset")
        .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(srows(Packing.packGreedyPlan(sdocs, col("doc_id"), col("nt"), 10L, 2))
      == srows(Packing.packGreedy(sdocs, col("doc_id"), col("nt"), 10L, 2)))
  }

  test("perplexity buckets: balanced terciles, ties to lower bucket, " +
    "na short docs, keep = head+middle, repartition-stable") {
    import graft.llm.PerplexityBuckets
    val docs = graft.sources.Tables.documents(spark, sf)
    val b = PerplexityBuckets.buckets(docs, col("doc_id"), col("text"),
      col("lang"))
    val rows = b.collect()
    // every scored doc bucketed; short docs are 'na' with null cutoffs
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_bigrams")
      val bucket = r.getAs[String]("bucket")
      if (nb == 0) {
        assert(bucket == "na" && r.isNullAt(r.fieldIndex("p33")))
      } else {
        assert(Set("head", "middle", "tail")(bucket))
        val (x, p33, p66) = (r.getAs[Long]("xent_i"),
          r.getAs[Long]("p33"), r.getAs[Long]("p66"))
        assert(p33 <= p66)
        // the bucket is exactly the cutoff comparison (ties go lower)
        val expect = if (x <= p33) "head" else if (x <= p66) "middle" else "tail"
        assert(bucket == expect)
        assert(r.getAs[Boolean]("keep") == (bucket != "tail"))
      }
    }
    // terciles are balanced within 1 plus the tie mass at each cutoff:
    // head holds >= ceil(n/3) (smallest value covering 1/3), and head
    // + middle >= ceil(2n/3)
    val perLang = rows.filter(_.getAs[Long]("n_bigrams") > 0)
      .groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (_, rs) =>
      val n = rs.length.toLong
      val h = rs.count(_.getAs[String]("bucket") == "head").toLong
      val hm = rs.count(r => r.getAs[String]("bucket") != "tail").toLong
      assert(3 * h >= n && 3 * hm >= 2 * n)
    }
    // deterministic under repartition (cutoff search + assignment)
    val b2 = PerplexityBuckets.buckets(docs.repartition(13), col("doc_id"),
      col("text"), col("lang")).collect()
    assert(rows.map(_.toString).sorted.toSeq == b2.map(_.toString).sorted.toSeq)
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing mass") {
    // corpus: a a a b b c d -> N=7, D=4, f1=2 (c,d), f2=1 (b)
    // chao1 = D + f1^2/(2 f2) = 4 + 2 = 6 -> 6000; unseen = 2/7
    val docs = Seq(("en", "a a a b b c d")).toDF("lang", "text")
    val r = TextOps.vocabRichness(docs, col("lang"), col("text"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == (("en", 7L, 4L, 2L, 1L, 6000L, 285714L)), r.toString)
  }

  test("vocabRichness: f2 = 0 falls back to the bias-corrected form") {
    // every type once: N=3, D=3, f1=3, f2=0
    // chao1 = D + f1(f1-1)/2 = 3 + 3 = 6 -> 6000; unseen mass = 1
    val docs = Seq(("x", "p q r")).toDF("lang", "text")
    val r = TextOps.vocabRichness(docs, col("lang"), col("text"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == (("x", 3L, 3L, 3L, 0L, 6000L, 1000000L)), r.toString)
  }

  test("readability: hand-computed Flesch; empty text is null-safe") {
    val docs = Seq((1L, "The cat sat."), (2L, ""),
      (3L, "Incomprehensibility! Extraordinary considerations?"))
      .toDF("doc_id", "text")
    val out = TextOps.readability(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // "The cat sat." : 1 sentence, 3 words, 3 vowel groups
    // flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(out(1L) == ((1L, 1L, 3L, 3L, Some(119.19))), out.toString)
    assert(out(2L)._5.isEmpty && out(2L)._2 == 1L, "empty text: null score")
    // long-word doc scores far below the simple one
    assert(out(3L)._5.get < out(1L)._5.get - 100, out.toString)
  }

  test("vocabRichness: a fully-saturated vocabulary estimates itself") {
    // no hapax, no dis: chao1 = D exactly, unseen mass 0
    val docs = Seq(("s", "w w w z z z")).toDF("lang", "text")
    val r = TextOps.vocabRichness(docs, col("lang"), col("text"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._6 == 2000L && r._7 == 0L, r.toString)
  }
}
