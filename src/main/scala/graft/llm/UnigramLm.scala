package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo '18 — the SentencePiece unigram
  * model, the BPE alternative whose segmentation is a per-word Viterbi
  * decode under piece probabilities instead of a merge-rank replay).
  * This is the hard-EM (Viterbi-EM) variant: the E-step segments every
  * word with the current piece scores and counts piece usage, the
  * M-step renormalizes — max/plus throughout, so no logsumexp and
  * every intermediate count is an exact integer (the soft-EM
  * forward–backward variant trades that determinism for slightly
  * better likelihood; documented choice).
  *
  * Scale shape = the [[Bpe.trainFromCorpus]] architecture: the
  * corpus-sized work is ONE map-combinable word-frequency groupBy; the
  * seed-candidate extraction, EM rounds, and pruning all run over the
  * bounded word-frequency TABLE (top-`maxWords`, collected like the
  * IVF codebook — model-artifact-sized, not corpus-sized).
  *
  * Determinism contract (the artifact must reproduce bit-for-bit from
  * its declared corpus — the q128 provenance discipline):
  *  - seed vocab = every single character + the top `seedSize`
  *    multi-char substrings (length ≤ `maxLen`) by (count desc, piece
  *    asc), counts = Σ word_freq × overlapping occurrences;
  *  - Viterbi scores ln(cnt) − ln(total) are doubles computed from
  *    exact integers — identical on any engine; the DP iterates
  *    position ascending, piece length ascending, and keeps the
  *    incumbent on EXACT ties (strict improvement only), so the
  *    segmentation is a pure function of the integer count table;
  *  - single-character pieces never die (count floor 1 after each
  *    E-step — the coverage guarantee: every word stays segmentable);
  *    multi-char pieces unused by any Viterbi path drop out;
  *  - final vocab = all single chars + top (vocabSize − #chars)
  *    multi-char by (count desc, piece asc).
  */
object UnigramLm {

  val MaxLen = 8
  val SeedSize = 1500
  val Rounds = 3
  val VocabSize = 300

  /** Classpath location of the checked-in piece table. */
  val VocabResource = "/graft/unigram_vocab.tsv"
  val UnkPiece = "<unk>"

  /** Piece length in CODE POINTS — the grid every length rule in this
    * tokenizer counts on (surrogate pair = 1). */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** The checked-in artifact: piece → count, plus the count total —
    * resolved once per JVM from the classpath (the [[Bpe.vocabIds]]
    * lifecycle: executors get it with the jar). */
  lazy val artifact: (Map[String, Long], Long) = {
    val in = getClass.getResourceAsStream(VocabResource)
    require(in != null,
      s"missing resource $VocabResource — run graft.tools.MakeUnigramVocab")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val m = src.getLines()
        .filter(ln => ln.nonEmpty && !ln.startsWith("rank\t"))
        .map { ln => val a = ln.split("\t", -1); a(1) -> a(2).toLong }.toMap
      (m, m.values.sum)
    } finally src.close()
  }

  /** Viterbi with TOTAL coverage: a single CODE POINT absent from the
    * vocab scores as count 1 (ln 1 = 0 numerator — the hardest
    * possible piece) and emits [[UnkPiece]], so arbitrary text always
    * segments. Same DP order and tie rule as [[viterbi]]. The DP grid
    * is code-point boundaries ([[Bpe.cpBounds]]): a supplementary-plane
    * character is ONE unknown piece, never two lone-surrogate `<unk>`s,
    * matching the oracle's code-point substr/len semantics (round-9
    * advice; BMP text is byte-identical either way). */
  def viterbiSafe(word: String, cnt: Map[String, Long], tot: Long,
                  maxLen: Int): Seq[String] = {
    val bd = Bpe.cpBounds(word)
    val n = bd.length - 1
    if (n == 0) return Nil
    val lnTot = math.log(tot.toDouble)
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(0)
    dp(0) = 0.0
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
      val c = cnt.getOrElse(word.substring(bd(i - l), bd(i)),
        if (l == 1) 1L else 0L)
      if (c > 0 && dp(i - l) != Double.NegativeInfinity) {
        val s = dp(i - l) + (math.log(c.toDouble) - lnTot)
        if (s > dp(i)) { dp(i) = s; back(i) = l }
      }
    }
    val out = mutable.ListBuffer.empty[String]
    var i = n
    while (i > 0) {
      val p = word.substring(bd(i - back(i)), bd(i))
      out.prepend(
        if (back(i) == 1 && !cnt.contains(p)) UnkPiece else p)
      i -= back(i)
    }
    out.toList
  }

  /** Segment `text` under the checked-in artifact: whitespace words,
    * each Viterbi-decoded, unknown characters as [[UnkPiece]]. */
  def encode(text: String): Array[String] = {
    val (cnt, tot) = artifact
    text.split("\\s+").iterator.filter(_.nonEmpty)
      .flatMap(w => viterbiSafe(w, cnt, tot, MaxLen)).toArray
  }

  /** Seed counts: Σ word_freq × overlapping substring occurrences for
    * every substring of length 1..maxLen — lengths and offsets in CODE
    * POINTS ([[Bpe.cpBounds]]), so no seed piece splits a surrogate
    * pair. */
  def substrCounts(freq: Seq[(String, Long)], maxLen: Int): Map[String, Long] = {
    val m = mutable.Map.empty[String, Long]
    for ((w, n) <- freq) {
      val bd = Bpe.cpBounds(w)
      val wn = bd.length - 1
      for (i <- 0 until wn; l <- 1 to math.min(maxLen, wn - i)) {
        val s = w.substring(bd(i), bd(i + l))
        m.update(s, m.getOrElse(s, 0L) + n)
      }
    }
    m.toMap
  }

  /** Viterbi decode of one word under ln(cnt)−ln(tot) scores; returns
    * the best piece sequence. Position ascending, length ascending,
    * strict improvement — ties keep the shorter-piece incumbent. */
  def viterbi(word: String, cnt: Map[String, Long], tot: Long,
              maxLen: Int): Seq[String] = {
    val bd = Bpe.cpBounds(word)
    val n = bd.length - 1
    if (n == 0) return Nil
    val lnTot = math.log(tot.toDouble)
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(0)
    dp(0) = 0.0
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
      if (dp(i - l) != Double.NegativeInfinity) {
        cnt.get(word.substring(bd(i - l), bd(i))) match {
          case Some(c) if c > 0 =>
            val s = dp(i - l) + (math.log(c.toDouble) - lnTot)
            if (s > dp(i)) { dp(i) = s; back(i) = l }
          case _ =>
        }
      }
    }
    require(dp(n) != Double.NegativeInfinity,
      s"word '$word' not segmentable — coverage invariant broken")
    val out = mutable.ListBuffer.empty[String]
    var i = n
    while (i > 0) { out.prepend(word.substring(bd(i - back(i)), bd(i))); i -= back(i) }
    out.toList
  }

  /** One hard-EM round: segment every word, count piece usage weighted
    * by word frequency; single chars floored to 1 (coverage), unused
    * multi-char pieces drop. */
  def emRound(freq: Seq[(String, Long)], cnt: Map[String, Long],
              maxLen: Int): Map[String, Long] = {
    val tot = cnt.values.sum
    val next = mutable.Map.empty[String, Long]
    for ((w, n) <- freq; p <- viterbi(w, cnt, tot, maxLen))
      next.update(p, next.getOrElse(p, 0L) + n)
    val chars = cnt.keysIterator.filter(cpLen(_) == 1)
    for (c <- chars) if (next.getOrElse(c, 0L) == 0L) next.update(c, 1L)
    next.toMap
  }

  /** Train on `docs`: returns `(rank, piece, cnt, p_ppm)` rows, rank
    * ascending by (cnt desc, piece asc). */
  def train(docs: DataFrame, text: Column, vocabSize: Int = VocabSize,
            maxLen: Int = MaxLen, seedSize: Int = SeedSize,
            rounds: Int = Rounds, maxWords: Int = 1000000,
            minFreq: Long = 1L): DataFrame = {
    require(vocabSize > 0 && maxLen >= 1 && rounds >= 1,
      s"invalid unigram params: $vocabSize/$maxLen/$rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-sized pass (bounded exactly like Bpe.trainFromCorpus)
    val freq = docs
      .select(explode(split(text, "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minFreq)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect().toSeq
    val seed = substrCounts(freq, maxLen)
    val chars = seed.keySet.filter(cpLen(_) == 1)
    val multi = seed.iterator.filter(kv => cpLen(kv._1) > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var cnt: Map[String, Long] =
      (chars.map(c => c -> seed(c)) ++ multi).toMap
    for (_ <- 1 to rounds) cnt = emRound(freq, cnt, maxLen)
    val keptMulti = cnt.iterator.filter(kv => cpLen(kv._1) > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.size))
    val vocab = (chars.toSeq.map(c => c -> cnt.getOrElse(c, 1L)) ++ keptMulti)
      .sortBy { case (p, c) => (-c, p) }
    val tot = vocab.map(_._2).sum
    vocab.zipWithIndex.map { case ((p, c), i) =>
      (i.toLong, p, c, 1000000L * c / tot)
    }.toDF("rank", "piece", "cnt", "p_ppm")
  }
}
