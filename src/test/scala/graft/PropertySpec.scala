package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ingest.Ingest
import graft.llm.TextOps
import graft.operators.Sessionization

/** Property-style tests: seeded random inputs checked against independent
  * in-memory reference implementations (differential testing), plus
  * algebraic invariants. One Spark job per suite, many random cases per
  * job — the generation is deterministic (fixed seed) so failures
  * reproduce. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val gap = Sessionization.DefaultGapMs

  test("sessionization matches an independent in-memory implementation " +
    "on random event streams (boundary gaps, ties included)") {
    val rnd = new scala.util.Random(42)
    // 50 users x ~40 events; gaps cluster around the 30-min boundary and
    // include exact == gapMs and 0 (same-millisecond ties).
    val events = (1 to 50).flatMap { u =>
      var ts = 1000000000000L + rnd.nextInt(1000000)
      (1 to (10 + rnd.nextInt(60))).map { i =>
        val choice = rnd.nextInt(6)
        val delta = choice match {
          case 0 => 0L                              // tie
          case 1 => gap                             // exactly the boundary
          case 2 => gap - 1                         // just inside
          case 3 => gap + 1                         // just outside
          case 4 => rnd.nextInt(gap.toInt).toLong   // inside
          case _ => gap + rnd.nextInt(gap.toInt)    // outside
        }
        ts += delta
        (s"u$u", ts, s"e${u}_$i")
      }
    }
    // independent reference: per user, sort by (ts, id); new session when
    // first event or gap >= gapMs; running counter.
    val expected = events.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var seq = 0L
      var prev = Option.empty[Long]
      sorted.map { case (u, ts, id) =>
        val isNew = prev.forall(p => ts - p >= gap)
        if (isNew) seq += 1
        prev = Some(ts)
        (id, if (isNew) 1 else 0, seq)
      }
    }.toSeq.sortBy(_._1)

    val df = events.toDF("user_id", "ts_ms", "event_id")
    val got = Sessionization.withSessionFlags(
      df, col("user_id"), col("ts_ms"), tieBreakers = Seq(col("event_id")))
      .select(col("event_id"), col("is_new_session"),
        col("session_seq").cast("long"))
      .as[(String, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("session ids are equal iff (user, session) is equal, and stable " +
    "across recomputation") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 20).flatMap { u =>
      var ts = 1500000000000L
      (1 to 30).map { i =>
        ts += (if (rnd.nextBoolean()) rnd.nextInt(gap.toInt).toLong
               else gap + rnd.nextInt(1000))
        (s"u$u", ts, s"e${u}_$i")
      }
    }
    val df = events.toDF("user_id", "ts_ms", "event_id")
    def run() = Sessionization.sessionize(
      df, col("user_id"), col("ts_ms"), tieBreakers = Seq(col("event_id")))
      .select(col("event_id"), col("user_id"),
        col("session_seq").cast("long"), col("session_id"))
      .as[(String, String, Long, String)].collect().toSeq.sortBy(_._1)
    val a = run()
    // injective both ways: same (user, seq) <=> same session_id
    val byKey = a.groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._4).distinct)
    assert(byKey.values.forall(_.size == 1), "one id per (user, session)")
    val byId = a.groupBy(_._4).view.mapValues(_.map(r => (r._2, r._3)).distinct)
    assert(byId.values.forall(_.size == 1), "one (user, session) per id")
    assert(a == run(), "stable across recomputation")
  }

  test("IP anonymization: idempotent, shape-preserving, total (ScalaCheck)") {
    val octet = Gen.choose(0, 255)
    val v4 = for {
      a <- octet; b <- octet; c <- octet; d <- octet
    } yield s"$a.$b.$c.$d"
    val v6Group = Gen.listOfN(4, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    val v6 = Gen.listOfN(8, v6Group).map(_.mkString(":"))
    val garbage = Gen.oneOf(Gen.alphaNumStr, Gen.const(""), Gen.const("not-an-ip"))
    val anyIp = Gen.oneOf(v4, v6, garbage)

    // evaluate anonymizeIp for a batch of generated strings in one job,
    // then a second round over the first round's outputs (idempotence)
    val samples = Gen.listOfN(300, anyIp)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(1L)).get
    val out = samples.toDF("ip")
      .select(col("ip"), Ingest.anonymizeIp(col("ip")).as("anon"))
      .as[(String, String)].collect().toMap
    val round2 = out.values.toSeq.distinct.toDF("ip")
      .select(col("ip"), Ingest.anonymizeIp(col("ip")).as("anon"))
      .as[(String, String)].collect().toMap
    val prop = Prop.forAll(Gen.oneOf(samples)) { ip =>
      val anon = out(ip)
      val v4Shape = ip.count(_ == '.') == 3 && ip.indexOf('.') >= 1
      (!v4Shape || anon.endsWith(".0")) &&
        (v4Shape || !ip.contains(':') || anon.endsWith(":0000:0000:0000:0000:0000")) &&
        round2(anon) == anon
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("BPE round-trip law on random in-vocab text: decode(encode_ids(s)) " +
      "strips whitespace; token streams always repartition s losslessly") {
    import graft.llm.Bpe
    // generate from the vocab's BASE symbols (single code points), so
    // every generated char is in-vocab and the round trip is exact
    val baseChars = Bpe.vocabIds.keys.filter(_.length == 1).map(_.head).toSeq.sorted
    assert(baseChars.nonEmpty)
    val word = Gen.nonEmptyListOf(Gen.oneOf(baseChars)).map(_.mkString)
    val text = Gen.listOf(Gen.oneOf(word, Gen.oneOf(" ", "  ", "\n", "\t")))
      .map(_.mkString(" "))
    val prop = Prop.forAll(text) { s =>
      val noWs = s.replaceAll("\\s+", "")
      // law 1: round trip = whitespace-stripped original (no unks)
      Bpe.decodeIds(Bpe.encodeIds(s)) == noWs &&
        // law 2: the token STRING stream is a lossless partition too
        Bpe.encode(s).mkString("") == noWs
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("rolling hash satisfies the Rabin-Karp composition law " +
    "h(a ++ b) = (h(a) * B^|b| + h(b)) mod P") {
    val (b, p) = (31L, 2147483647L)
    def powMod(base: Long, e: Long): Long = {
      var (r, bb, ee) = (1L, base % p, e)
      while (ee > 0) {
        if ((ee & 1) == 1) r = r * bb % p
        bb = bb * bb % p; ee >>= 1
      }
      r
    }
    val rnd = new scala.util.Random(9)
    val pieces = (1 to 40).map { _ =>
      val len = 1 + rnd.nextInt(30)
      (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val pairs = pieces.grouped(2).collect { case Seq(a, bb) => (a, bb) }.toSeq
    val rows = pairs.zipWithIndex.map { case ((a, bb), i) => (i, a, bb, a + bb) }
    val got = rows.toDF("i", "a", "b", "ab")
      .select(col("i"),
        TextOps.rollingHash(col("a")).as("ha"),
        TextOps.rollingHash(col("b")).as("hb"),
        TextOps.rollingHash(col("ab")).as("hab"),
        length(col("b")).cast("long").as("lb"))
      .as[(Int, Long, Long, Long, Long)].collect()
    got.foreach { case (_, ha, hb, hab, lb) =>
      assert(hab == (ha * powMod(b, lb) + hb) % p,
        s"composition law violated: ha=$ha hb=$hb hab=$hab |b|=$lb")
    }
  }

  test("PII redaction is idempotent on random digit/email/text soup") {
    import graft.llm.TextOps
    val rnd = new scala.util.Random(11)
    val atoms = Seq("call", "030-1234-5678", "a@b.co", "10.0.0.1", "+43 1 555 0100",
      "2024", "41111111111111112222", "x", "word", ".", "-", "(01)", "@")
    val rows = (1 to 200).map { i =>
      (i, (1 to (1 + rnd.nextInt(12))).map(_ => atoms(rnd.nextInt(atoms.length)))
        .mkString(" "))
    }
    val got = rows.toDF("i", "text")
      .select(col("i"), TextOps.redactPii(col("text")).as("once"))
      .withColumn("twice", TextOps.redactPii(col("once")))
      .as[(Int, String, String)].collect()
    got.foreach { case (i, once, twice) =>
      assert(once == twice, s"not idempotent on row $i: $once -> $twice")
    }
  }

  test("line dedup is idempotent: a second pass removes nothing") {
    import graft.llm.LineDedup
    val rnd = new scala.util.Random(12)
    val lines = (1 to 15).map(j => s"line body $j")
    val docs = (1 to 60).map { i =>
      (i.toLong, (0 to rnd.nextInt(6)).map { _ =>
        if (rnd.nextInt(4) == 0) "" else lines(rnd.nextInt(lines.length))
      }.mkString("\n"))
    }.toDF("doc_id", "text")
    val once = LineDedup.removeDuplicatedLines(docs, col("doc_id"), col("text"))
      .withColumnRenamed("clean_text", "text")
    val twice = LineDedup.removeDuplicatedLines(once, col("doc_id"), col("text"))
    val a = once.orderBy("doc_id").as[(Long, String)].collect().toSeq
    val bb = twice.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(a == bb)
  }

  test("keep-first-within-horizon matches an in-memory fold on random " +
    "streams (boundary deltas, ties, chained restarts)") {
    import graft.streaming.StreamingDedup
    val rnd = new scala.util.Random(17)
    val horizon = 100L
    val events = (1 to 40).flatMap { k =>
      var ts = 1000L + rnd.nextInt(50)
      (1 to 5 + rnd.nextInt(40)).map { i =>
        ts += (rnd.nextInt(5) match {
          case 0 => 0L            // tie
          case 1 => horizon       // exactly at the boundary (dropped: not >)
          case 2 => horizon + 1   // just past (kept)
          case 3 => rnd.nextInt(horizon.toInt).toLong
          case _ => horizon + rnd.nextInt(200)
        })
        (k.toLong * 10000 + i, k.toLong, ts)
      }
    }
    // reference fold: per key in (ts, id) order, keep iff ts > lastKept + h
    val expected = events.groupBy(_._2).flatMap { case (_, evs) =>
      var lastKept = Long.MinValue
      var first = true
      evs.sortBy(e => (e._3, e._1)).flatMap { case (id, _, ts) =>
        if (first || ts > lastKept + horizon) {
          first = false; lastKept = ts; Some(id)
        } else None
      }
    }.toSet
    val got = StreamingDedup.keepFirstWithinHorizon(
      events.toDF("event_id", "user_id", "ts_ms"),
      "user_id", "ts_ms", horizon, "event_id")
      .select("event_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("BM25 scores are invariant under corpus permutation") {
    import graft.llm.Bm25
    // BM25 depends on corpus STATISTICS (N, avgdl, df), never on row
    // order — at scale row order is partitioning noise, so any order
    // sensitivity (e.g. a non-commutative float fold) is a bug.
    val rnd = new scala.util.Random(7)
    val words = Seq("hash", "merge", "vector", "tree", "scan", "sort")
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 until 5 + rnd.nextInt(40))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    def run(rows: Seq[(Long, String)]): Map[Long, Double] =
      Bm25.score(rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
        Seq("vector", "hash", "tree"))
        .as[(Long, Double)].collect().toMap
    val base = run(docs)
    val shuffled = run(rnd.shuffle(docs))
    assert(base == shuffled) // bit-equal, not approximately
  }

  test("winnowing guarantee: a planted shared span >= w+k-1 chars is " +
    "always detected, at random k and w") {
    import graft.llm.Winnowing
    // The MOSS guarantee: winnowing selects at least one fingerprint
    // from every window of w consecutive k-grams, so two documents
    // sharing a verbatim run of >= w+k-1 code points share >= 1
    // selected fingerprint. Differentially test it for random (k, w)
    // and random host texts around a planted span.
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 8) {
      val k = 4 + rnd.nextInt(12) // 4..15
      val w = 2 + rnd.nextInt(8)  // 2..9
      val span = (0 until (w + k - 1) + rnd.nextInt(20))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      def host(): String = {
        val pre = (0 until rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        val post = (0 until rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        pre + span + post
      }
      val docs = Seq((1L, host()), (2L, host())).toDF("doc_id", "text")
      val shared = Winnowing.fingerprints(docs, col("doc_id"), col("text"), k, w)
        .select(explode(col("fps")).as("fp"), col("doc_id"))
        .groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("n"))
        .where(col("n") === 2).count()
      assert(shared >= 1,
        s"planted ${span.length}-char span missed at k=$k w=$w")
    }
  }

  test("scrub composition: idempotent when redaction adds no collisions; " +
    "shrink-only in general") {
    import graft.jobs.CorpusPipeline
    val rnd = new scala.util.Random(23)
    // (a) GENERAL soup, including distinct-PII lines that redaction
    // canonicalizes into IDENTICAL lines ("call [PHONE]") — so full
    // idempotence is impossible by construction (the second line-dedup
    // sees new cross-doc duplicates). The lawful invariant is monotone
    // shrinking: a second scrub only removes whole lines, never edits
    // or adds.
    val boiler = Seq("subscribe to our newsletter", "all rights reserved",
      "contact us at help@example.com")
    def soup(tag: Long => String) = (0 until 40).map { i =>
      val lines = (0 until 2 + rnd.nextInt(6)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => boiler(rnd.nextInt(boiler.size))
          case 1 => s"${tag(i)}call ${100 + rnd.nextInt(900)}-555-${1000 + rnd.nextInt(9000)}"
          case 2 => s"${tag(i)}user${rnd.nextInt(50)}@mail${rnd.nextInt(9)}.org wrote:"
          case _ => (0 until 5).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        }
      }
      (i.toLong, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusPipeline.scrub(df, col("doc_id"), "text")
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val once = run(soup(_ => ""))
    val twice = run(once.toDF("doc_id", "text"))
    once.zip(twice).foreach { case ((id1, t1), (id2, t2)) =>
      assert(id1 == id2)
      val l1 = t1.split("\n", -1).toSeq
      // a doc whose every line was dropped reassembles to "" (one empty
      // line artifact) — still "nothing added", so exempt it
      assert(t2.split("\n", -1).filter(_.nonEmpty).forall(l1.contains),
        s"second scrub INVENTED content for doc $id1")
    }
    // (b) doc-unique prefixes keep redacted lines distinct across docs
    // (no new collisions) — there the composition IS idempotent.
    val once2 = run(soup(i => s"doc$i "))
    val twice2 = run(once2.toDF("doc_id", "text"))
    assert(once2 == twice2)
  }

  test("hash sampling nests: rate p1 <= p2 implies sample(p1) is a subset") {
    import graft.llm.Splits
    val ids = (1L to 2000L).toDF("id")
    val rates = Seq(50, 200, 500, 900)
    val kept = rates.map { r =>
      r -> ids.filter(Splits.hashSample(col("id"), lit(r), "nest"))
        .as[Long].collect().toSet
    }
    kept.sliding(2).foreach { case Seq((r1, s1), (r2, s2)) =>
      assert(s1.subsetOf(s2), s"sample($r1) ⊄ sample($r2)")
      // and the rate is roughly honored (±50% slack at these sizes)
      assert(s1.size > r1 && s1.size < r1 * 3, s"rate $r1: got ${s1.size}/2000")
    }
  }

  test("substring dedup covers a planted shared run at random k, length, offset") {
    import graft.llm.SubstringDedup
    val rnd = new scala.util.Random(7)
    def filler(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 8).foreach { trial =>
      val k = 8 + rnd.nextInt(20)            // 8..27
      val run = filler(k + rnd.nextInt(40))  // k .. k+39
      val off1 = 5 + rnd.nextInt(50)
      val off2 = 3 + rnd.nextInt(70)
      val docs = Seq(
        (1L, filler(off1) + run + filler(10 + rnd.nextInt(40))),
        (2L, filler(off2) + run + filler(10 + rnd.nextInt(40)))
      ).toDF("doc_id", "text")
      val spans = SubstringDedup.duplicatedSpans(docs, col("doc_id"), col("text"), k)
        .as[(Long, Long, Long)].collect()
      // every code point of the planted run lies inside some span of
      // its host (spans may extend further if filler collides — the
      // guarantee is coverage, never a miss)
      for ((doc, off) <- Seq((1L, off1.toLong), (2L, off2.toLong))) {
        val host = spans.filter(_._1 == doc)
        val covered = (off until off + run.length).forall(p =>
          host.exists(s => s._2 <= p && p < s._3))
        assert(covered, s"trial $trial (k=$k): run not covered in doc $doc")
      }
    }
  }

  test("mixture sampling is invariant under uniform weight scaling") {
    import graft.llm.Mixture
    val rnd = new scala.util.Random(11)
    val docs = (1L to 900L).map(i =>
      (i, s"s${rnd.nextInt(4)}")).toDF("id", "st")
    val w1 = Map("s0" -> 1, "s1" -> 2, "s2" -> 3, "s3" -> 5)
    val w3 = w1.map { case (k, v) => k -> v * 3 }
    val a = Mixture.sampleToMixture(docs, col("id"), col("st"), w1)
      .select("id").as[Long].collect().toSet
    val b = Mixture.sampleToMixture(docs, col("id"), col("st"), w3)
      .select("id").as[Long].collect().toSet
    assert(a == b, "scaling every weight by 3 changed the kept set")
  }

  test("snapshot diff reverses cleanly: added and removed swap, the rest hold") {
    import graft.operators.SnapshotDiff
    val rnd = new scala.util.Random(13)
    val old = (1L to 300L).filter(_ => rnd.nextBoolean())
      .map(i => (i, s"v${rnd.nextInt(3)}")).toDF("id", "body")
    val neu = (1L to 300L).filter(_ => rnd.nextBoolean())
      .map(i => (i, s"v${rnd.nextInt(3)}")).toDF("id", "body")
    val fwd = SnapshotDiff.diff(old, neu, col("id"), col("body"))
      .as[(Long, String)].collect().toMap
    val rev = SnapshotDiff.diff(neu, old, col("id"), col("body"))
      .as[(Long, String)].collect().toMap
    assert(fwd.keySet == rev.keySet)
    fwd.foreach { case (k, st) =>
      val want = st match {
        case "added" => "removed"
        case "removed" => "added"
        case other => other
      }
      assert(rev(k) == want, s"key $k: $st fwd vs ${rev(k)} rev")
    }
  }

  test("char entropy is bounded by ln(distinct code points) and invariant " +
    "under permutation of the text") {
    val rnd = new scala.util.Random(77)
    // alphabet as WHOLE code points (a toCharArray would emit the
    // emoji's lone surrogates, which mangle differently under UTF-8)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h",
      "日", "本", "語", "😀", " ", "\n")
    val texts = (1 to 40).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(60)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val perms = texts.map { case (i, t) =>
      // shuffle CODE POINTS, not chars — a char shuffle would tear the
      // emoji's surrogate pair and change the code-point multiset
      val cps = t.codePoints().toArray.toList
      val shuffled = rnd.shuffle(cps)
        .foldLeft(new java.lang.StringBuilder())((sb, cp) =>
          sb.appendCodePoint(cp)).toString
      (i, t, shuffled)
    }
    val df = perms.toDF("id", "a", "b")
      .select(col("id"),
        call_function("char_entropy", col("a")).as("ea"),
        call_function("char_entropy", col("b")).as("eb"))
      .select(col("id"), col("ea.entropy").as("ha"), col("ea.n_cp"),
        col("eb.entropy").as("hb"))
      .as[(Long, Double, Long, Double)].collect()
    df.foreach { case (id, ha, n, hb) =>
      assert(ha == hb, s"$id: entropy must be permutation-invariant")
      assert(ha >= 0.0 && ha <= math.log(n.toDouble) + 1e-12,
        s"$id: H=$ha out of [0, ln($n)]")
    }
  }

  test("funnel stage times are strictly increasing wherever present") {
    val out = graft.operators.Cohorts.funnel(
      graft.sources.Tables.events(spark, sf), col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view", "purchase"))
      .select("t1_ms", "t2_ms", "t3_ms")
      .as[(Option[Long], Option[Long], Option[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (t1, t2, t3) =>
      for (a <- t1; b <- t2) assert(a < b)
      for (b <- t2; c <- t3) assert(b < c)
      assert(!(t2.isDefined && t1.isEmpty), "t2 without t1")
      assert(!(t3.isDefined && t2.isEmpty), "t3 without t2")
    }
  }

  test("tf-idf rank-1 equals the brute-force argmax on random documents") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 30L).map { i =>
      (i, (1 to (3 + rnd.nextInt(20)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val top = graft.llm.TfIdf.topTerms(df, col("doc_id"), col("text"), k = 1)
      .select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    // driver-side reference
    val toks = docs.map { case (i, t) => i -> t.split("\\s+").toSeq }
    val n = docs.size
    val dfm = toks.flatMap(_._2.distinct.map(_ -> 1))
      .groupBy(_._1).view.mapValues(_.size).toMap
    toks.foreach { case (i, ws) =>
      val scores = ws.groupBy(identity).view.mapValues(_.size).toMap.map {
        case (w, tf) =>
          w -> tf * (math.log((n + 1.0) / (dfm(w) + 1.0)) + 1.0)
      }
      val best = scores.toSeq.sortBy { case (w, sc) => (-sc, w) }
      // engine tie-break is term DESC on equal scores
      val bestScore = best.head._2
      val winners = scores.filter(_._2 == bestScore).keys.toSeq.sorted.reverse
      assert(top(i) == winners.head,
        s"doc $i: engine ${top(i)} vs reference ${winners.head}")
    }
  }

  test("chunking reconstructs the token stream: stride-aligned prefixes " +
    "of each chunk concatenate back to the document") {
    val rnd = new scala.util.Random(5)
    val docs = (1L to 25L).map { i =>
      (i, (1 to rnd.nextInt(120)).map(j => s"t$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = graft.llm.Chunking.chunk(df, col("doc_id"), col("text"),
        chunkTokens = 16, stride = 11)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    docs.foreach { case (i, text) =>
      val want = text.split("\\s+").filter(_.nonEmpty).toSeq
      if (want.isEmpty) assert(!chunks.contains(i))
      else {
        val got = chunks(i)
        // non-final chunks contribute their first `stride` tokens; the
        // final chunk contributes all of its tokens
        val rebuilt = got.init.flatMap(_.split(" ").take(11)) ++
          got.last.split(" ")
        assert(rebuilt == want, s"doc $i rebuild mismatch")
      }
    }
  }

  test("bounded_levenshtein equals the unbounded builtin under the bound " +
    "and clamps to maxd+1 above it, on random unicode pairs") {
    val rnd = new scala.util.Random(1096)
    val alphabet = Vector("a", "b", "c", "d", "日", "本", "😀", " ")
    def word(n: Int): String = (1 to n)
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = (1 to 120).map { i =>
      val base = word(1 + rnd.nextInt(40))
      val other = rnd.nextInt(3) match {
        case 0 => // small mutation of base: distance lands near 0
          val cps = base.codePoints().toArray.toBuffer
          (1 to rnd.nextInt(4)).foreach { _ =>
            if (cps.nonEmpty) cps(rnd.nextInt(cps.length)) = 'z'.toInt
          }
          cps.foldLeft(new java.lang.StringBuilder())(
            (sb, cp) => sb.appendCodePoint(cp)).toString
        case 1 => word(1 + rnd.nextInt(40)) // unrelated
        case _ => base // identical: distance 0
      }
      (i.toLong, base, other, rnd.nextInt(12))
    }
    val got = pairs.toDF("id", "a", "b", "maxd")
      .select(col("id"),
        call_function("bounded_levenshtein", col("a"), col("b"),
          col("maxd")).as("bl"),
        levenshtein(col("a"), col("b")).as("lev"), col("maxd"))
      .as[(Long, Int, Int, Int)].collect()
    assert(got.length == 120)
    got.foreach { case (id, bl, lev, maxd) =>
      if (lev <= maxd) assert(bl == lev,
        s"pair $id: bounded=$bl != builtin=$lev under maxd=$maxd")
      else assert(bl == maxd + 1,
        s"pair $id: bounded=$bl must clamp to ${maxd + 1} (lev=$lev)")
    }
    // surrogate pairs count once (code-point semantics, like the builtin)
    val emoji = pairs.take(1).map(_ => (1L, "😀😀😀", "😀😀", 5))
      .toDF("id", "a", "b", "maxd")
      .select(call_function("bounded_levenshtein", col("a"), col("b"),
        col("maxd"))).as[Int].head()
    assert(emoji == 1)
  }

  test("bounded_levenshtein early-exit and edge contracts (direct)") {
    import graft.expressions.BoundedLevenshtein.computeCp
    def cp(s: String): Array[Int] = s.codePoints().toArray
    // negative maxd behaves as 0: only equality passes
    assert(computeCp(cp("abc"), cp("abc"), 0) == 0)
    assert(computeCp(cp("abc"), cp("abd"), 0) == 1) // clamp = maxd+1
    // length-gap shortcut: no DP rows touched, immediate maxd+1
    assert(computeCp(cp("a" * 1000), cp("a"), 10) == 11)
    // band exit: totally disjoint long strings reject at the clamp
    assert(computeCp(cp("a" * 500), cp("b" * 500), 7) == 8)
    // empty sides
    assert(computeCp(cp(""), cp("xy"), 5) == 2)
    assert(computeCp(cp("xy"), cp(""), 1) == 2) // gap 2 > maxd 1 → clamp
    // exact at the boundary: distance == maxd is returned, not clamped
    assert(computeCp(cp("kitten"), cp("sitting"), 3) == 3)
    assert(computeCp(cp("kitten"), cp("sitting"), 2) == 3) // clamp
  }

  test("varint roundtrip + byte-width law on random sorted lists") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.expressions.Varint
    val rnd = new scala.util.Random(4711)
    def leb128Width(v: Long): Int = { // independent reference
      var x = v; var n = 1
      while (x >= 128L) { x >>>= 7; n += 1 }
      n
    }
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(60)
      // mixed-magnitude ascending list: gaps from 0 to ~2^45
      var acc = math.abs(rnd.nextLong()) % 1000L
      val xs = (0 until n).map { _ =>
        acc += (math.abs(rnd.nextLong()) % (1L << rnd.nextInt(46)))
        acc
      }
      val packed = Varint.pack(new GenericArrayData(xs.toArray))
      val expectBytes =
        if (xs.isEmpty) 0
        else leb128Width(xs.head) +
          xs.sliding(2).collect { case Seq(a, b) => leb128Width(b - a) }.sum
      assert(packed.length == expectBytes, s"width law on $xs")
      val out = Varint.unpack(packed)
      assert((0 until out.numElements()).map(out.getLong) == xs,
        s"roundtrip on $xs")
    }
  }

  test("ac_scan equals the brute-force position scan on random texts and pattern sets") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.StringType
    val rnd = new scala.util.Random(1337)
    val alphabet = "abcB "
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 200) {
      val pats = (1 to (1 + rnd.nextInt(6)))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
        .filter(_.trim.nonEmpty) // avoid all-space phrases for clarity
        .map(_.toLowerCase).distinct
      if (pats.nonEmpty) {
        val text = randStr(rnd.nextInt(60))
        val auto = graft.expressions.AcScan.cached(pats.toArray)
        val row = auto.scan(UTF8String.fromString(text))
        val gotHits = row.getArray(0)
          .toObjectArray(StringType).map(_.toString).toSeq
        val gotOcc = row.getLong(1)
        val lt = text.toLowerCase
        val occ = pats.map(p =>
          p -> (0 to lt.length - p.length).count(i => lt.startsWith(p, i)))
        assert(gotOcc == occ.map(_._2.toLong).sum, s"occ: '$text' vs $pats")
        assert(gotHits.sorted == occ.filter(_._2 > 0).map(_._1).sorted,
          s"hits: '$text' vs $pats")
      }
    }
  }
}
