package graft.llm

/** WordPiece tokenizer — the third standard subword family next to BPE
  * ([[Bpe]], frequency-scored merges) and unigram-LM ([[UnigramLm]],
  * Viterbi under a piece LM): BERT's tokenizer (Schuster & Nakajima
  * '12; the merge scoring and greedy encoder as publicly documented in
  * the BERT/HuggingFace tokenizer implementations).
  *
  * TRAINING is the BPE merge loop with one change: instead of the most
  * FREQUENT adjacent pair, merge the pair with the highest LIKELIHOOD
  * GAIN score count(lr) / (count(l)·count(r)) — the pair whose joint
  * occurrence is most above what its parts' popularity predicts, so
  * "##iz ##ation" can beat "the ##e" even at lower raw count. Scores
  * compare by exact cross-multiplication (count(lr)₁·count(l)₂·count(r)₂
  * vs the mirror) — no doubles, so training is bit-reproducible; ties
  * break lexicographically on (l, r) like the BPE trainer.
  *
  * Word-internal position is part of the symbol: the first character of
  * a word is bare, every later symbol carries the `##` continuation
  * prefix, and a merge concatenates dropping the right side's `##`.
  *
  * ENCODING is greedy longest-match-first — NOT merge replay: per word,
  * repeatedly take the longest prefix (with `##` when not at word
  * start) present in the vocabulary; if at any position no piece
  * matches, the ENTIRE word becomes `[UNK]` (the all-or-nothing rule
  * BERT's tokenizer applies), as does any word over [[MaxWordChars]]
  * characters. A pure per-word function — ships as the native
  * `wordpiece_encode` codegen expression with zero shuffle.
  */
object WordPiece {

  val VocabResource = "/graft/wordpiece_vocab.tsv"
  val UnkToken = "[UNK]"
  val ContPrefix = "##"
  val MaxWordChars = 100
  val NumMerges = 200

  /** The checked-in vocabulary: piece set for the greedy matcher, plus
    * the max piece character length (caps the longest-match scan).
    * Resolved once per JVM from the classpath (the [[Bpe.vocabIds]]
    * lifecycle: executors get it with the jar). */
  lazy val vocab: (Set[String], Int) = {
    val in = getClass.getResourceAsStream(VocabResource)
    require(in != null,
      s"missing resource $VocabResource — run graft.tools.MakeWordPieceVocab")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val pieces = src.getLines()
        .filter(ln => ln.nonEmpty && !ln.startsWith("id\t"))
        .map(_.split("\t", -1)(1)).toSet
      val maxLen = pieces.iterator.map { p =>
        val b = p.stripPrefix(ContPrefix)
        b.codePointCount(0, b.length) // the scan cap counts code points
      }.max
      (pieces, maxLen)
    } finally src.close()
  }

  /** Symbol sequence of a word for TRAINING: first code point bare,
    * the rest `##`-prefixed. */
  def wordSymbols(word: String): Array[String] = {
    val cps = Bpe.codePointSymbols(word)
    cps.zipWithIndex.map { case (c, i) => if (i == 0) c else ContPrefix + c }
  }

  /** Greedy longest-match-first encode of one word against a piece set.
    * `maxPieceLen` bounds the scan (longest piece in the vocab). All
    * positions and lengths — including the [[MaxWordChars]] cap — count
    * CODE POINTS ([[Bpe.cpBounds]] grid), matching the oracle's
    * substr/len semantics; no candidate ever splits a surrogate pair. */
  def encodeWord(word: String, pieces: Set[String], maxPieceLen: Int): Array[String] = {
    val bd = Bpe.cpBounds(word)
    val n = bd.length - 1
    if (n == 0) return Array.empty
    if (n > MaxWordChars) return Array(UnkToken)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      var l = math.min(maxPieceLen, n - i)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (i == 0) word.substring(0, bd(l))
          else ContPrefix + word.substring(bd(i), bd(i + l))
        if (pieces.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) return Array(UnkToken) // all-or-nothing
      out += hit
      i += l
    }
    out.toArray
  }

  /** Encode text under the checked-in vocabulary: whitespace words,
    * each greedily matched. */
  def encode(text: String): Array[String] = {
    val (pieces, maxLen) = vocab
    Bpe.splitWords(text).flatMap(w => encodeWord(w, pieces, maxLen))
  }

  /** The likelihood-scored merge loop over a word-frequency table.
    * Counts are exact Longs; the score comparison cross-multiplies
    * (sound while count³ < 2⁶³ — corpus-size-bounded, loudly guarded).
    * Stops early when the best pair occurs once (no generalization
    * evidence) — the BPE trainer's economy rule. */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocabT: Map[List[String], Long] =
      wordFreq.map { case (w, n) => wordSymbols(w).toList -> n }
        .groupMapReduce(_._1)(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.Map.empty[String, Long]
      vocabT.foreach { case (syms, n) =>
        syms.foreach(s => symCnt(s) = symCnt.getOrElse(s, 0L) + n)
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + n
        }
      }
      if (pairCnt.isEmpty) stop = true
      else {
        // argmax of c_lr/(c_l·c_r) by exact cross-multiplication
        val best = pairCnt.toSeq.reduceLeft { (a, b) =>
          val ((al, ar), ac) = a; val ((bl, br), bc) = b
          val aden = Math.multiplyExact(symCnt(al), symCnt(ar))
          val bden = Math.multiplyExact(symCnt(bl), symCnt(br))
          val left = Math.multiplyExact(ac, bden)
          val right = Math.multiplyExact(bc, aden)
          if (left > right) a
          else if (left < right) b
          else if (Ordering[(String, String)].lteq((al, ar), (bl, br))) a
          else b
        }
        val (pair, cnt) = best
        if (cnt < 2) stop = true
        else {
          merges += pair
          val joined = pair._1 + pair._2.stripPrefix(ContPrefix)
          vocabT = vocabT.map { case (syms, n) =>
            (applyMerge(syms, pair, joined), n)
          }.groupMapReduce(_._1)(_._2)(_ + _)
          k += 1
        }
      }
    }
    merges.result()
  }

  /** Leftmost-greedy fold of one merge (the [[graft.tools.MakeBpeVocab]]
    * discipline), with the `##`-stripping concatenation. */
  def applyMerge(syms: List[String], pair: (String, String),
                 joined: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == pair._1 && b == pair._2 =>
          out += joined; rest = tail
        case a :: tail => out += a; rest = tail
        case Nil =>
      }
    }
    out.result()
  }

  /** Id space: 0 = `[UNK]`, 1.. = base symbols (bare + `##` forms of
    * the training code points, sorted), then merge outputs in rank
    * order; duplicate strings (two merge paths can assemble the same
    * piece) keep their FIRST id. */
  def vocabRows(wordFreq: Map[String, Long],
                merges: Seq[(String, String)]): Seq[(Int, String)] = {
    val base = wordFreq.keysIterator.flatMap(wordSymbols).toSet.toSeq.sorted
    val all = Seq(UnkToken) ++ base ++
      merges.map { case (l, r) => l + r.stripPrefix(ContPrefix) }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    all.foreach(seen += _)
    seen.toSeq.zipWithIndex.map { case (s, i) => (i, s) }
  }

  /** Distributed corpus → trainer (the [[Bpe.trainFromCorpus]] shape:
    * the word-frequency table is the bounded model-sized state —
    * top-`maxWords` by (freq desc, word asc) — and the merge loop runs
    * on the driver over it). Returns (id, token) vocab rows. */
  def trainFromCorpus(docs: org.apache.spark.sql.DataFrame,
                      text: org.apache.spark.sql.Column,
                      numMerges: Int = NumMerges,
                      maxWords: Int = 1000000,
                      minFreq: Long = 1L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(numMerges > 0 && maxWords > 0 && minFreq >= 1,
      s"invalid trainer params: $numMerges/$maxWords/$minFreq")
    val spark = docs.sparkSession
    import spark.implicits._
    val freq = docs
      .select(explode(split(text, "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minFreq)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    val rows = vocabRows(freq.toMap, train(freq.toMap, numMerges))
    rows.map { case (i, s) => (i.toLong, s) }.toDF("id", "token")
  }
}
