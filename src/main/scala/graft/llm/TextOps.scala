package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization counts, punctuation/stopword quality signals, a stopword
  * n-gram language-ID heuristic, and a normalized-text fingerprint for
  * exact deduplication.
  *
  * The integer ingredients (token/subtoken/punct counts, stopword votes,
  * normalized text) all come from ONE native code-point pass per
  * document ([[graft.expressions.TextStatsExpr]], codegen'd; requires
  * GraftExtensions, which GraftSession/Verify/Bench register). The
  * round-2 formulations ran five regex passes per document — kept below
  * (`*Regex`) as the independent formulations the spec asserts
  * bit-equality against. Ratios/votes stay Column arithmetic, so the
  * rounding and null semantics are exactly the round-2 ones; whole-stage
  * codegen's subexpression elimination evaluates the struct once per row
  * even when eight output columns read it.
  */
object TextOps {

  /** Flesch reading-ease per document (Flesch '48; Kincaid '75's
    * military-manual calibration made it the de-facto readability
    * gate) — the curation signal orthogonal to [[quality]]'s
    * punctuation/stopword ratios: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with syllables approximated by VOWEL
    * GROUPS (the standard cheap heuristic; whitespace breaks groups,
    * so one regexp count over the whole text equals the per-word
    * sum). All three inputs are exact integer regexp counts; the one
    * double formula is a single fixed expression rounded to 4, so the
    * score hash-gates. Pure per-row projection, zero shuffle.
    * `(id, n_sents, n_words, n_syllables, flesch)`. */
  def readability(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        greatest(regexp_count(text, lit("[.!?]+")), lit(1L)).as("n_sents"),
        size(lowerTokens(text)).cast("long").as("n_words"),
        regexp_count(lower(text), lit("[aeiouy]+")).as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0L,
          round(lit(206.835)
            - lit(1.015) * col("n_words").cast("double")
              / col("n_sents").cast("double")
            - lit(84.6) * col("n_syllables").cast("double")
              / col("n_words").cast("double"), 4)))

  /** Per-group vocabulary richness — the "how much vocabulary haven't
    * we seen?" report a tokenizer budget is planned against: observed
    * type/token counts, hapax/dis legomena, the Chao1 lower bound on
    * true vocabulary size (Chao '84: D + f₁²/(2f₂)) and the
    * Good–Turing unseen-probability mass (f₁/N — the chance the next
    * token is a NEW type). Exact rationals on the ppm grid:
    * chao1_x1000 = ⌊1000·(2·D·f₂ + f₁²)/(2·f₂)⌋ (f₂ = 0 falls back to
    * the Chao1-bias-corrected f₁(f₁−1)/2 + D form), gt_unseen_ppm =
    * ⌊10⁶·f₁/N⌋. One corpus explode + two integer groupBys — the
    * count-of-counts table is frequency-bounded. */
  def vocabRichness(docs: DataFrame, group: Column,
                    text: Column): DataFrame = {
    val tf = docs.select(group.as("grp"),
        explode(lowerTokens(text)).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("n"))
    tf.groupBy("grp").agg(
        sum("n").as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("n") === 1L, 1)).as("f1"),
        count(when(col("n") === 2L, 1)).as("f2"))
      .select(col("grp").as("group"), col("n_tokens"), col("n_types"),
        col("f1"), col("f2"),
        expr("""CASE WHEN f2 > 0L
                THEN (1000L * (2L * n_types * f2 + f1 * f1)) div (2L * f2)
                ELSE 1000L * n_types + (1000L * f1 * (f1 - 1L)) div 2L
                END""").as("chao1_x1000"),
        expr("(1000000L * f1) div greatest(n_tokens, 1L)")
          .as("gt_unseen_ppm"))
  }

  val SubtokenRe = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es" -> Seq("el", "la", "los", "que", "y", "en", "un", "una"),
    "fr" -> Seq("le", "les", "et", "des", "une", "du", "dans", "pour"))
  /** Fixed priority for argmax ties. */
  val LangOrder: Seq[String] = Seq("en", "de", "es", "fr")

  /** The one-pass native stats struct (see [[graft.expressions.TextStats]]). */
  def stats(text: Column): Column = call_function("text_stats", text)

  def tokens(text: Column): Column = split(text, "\\s+")

  /** Lowercased whitespace tokens, empties dropped — the shared
    * tokenization of the vocabulary/BM25 operators (their DuckDB mirrors
    * track this one definition). */
  def lowerTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  def nTokens(text: Column): Column = stats(text).getField("n_tokens")

  def nSubtokens(text: Column): Column = stats(text).getField("n_subtokens")

  def punctRatio(text: Column): Column = {
    val st = stats(text)
    // nullif: empty text → null ratio, not an ANSI divide-by-zero error
    // (empty documents are routine at scale)
    round(st.getField("n_punct").cast("double") /
      nullif(st.getField("n_chars"), lit(0)), 4)
  }

  def stopwordRatio(text: Column): Column = {
    val st = stats(text)
    round(st.getField("s_en").cast("double") / st.getField("n_tokens"), 4)
  }

  def avgTokenLen(text: Column): Column = {
    val st = stats(text)
    st.getField("n_nonws").cast("double") / st.getField("n_tokens")
  }

  /** Stopword-vote language ID; ties go to LangOrder; zero votes →
    * 'unknown'. */
  def langId(text: Column): Column = {
    val st = stats(text)
    val scores = LangOrder.map(l => l -> st.getField(s"s_$l"))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, "unknown")) { case (acc, (l, s)) =>
      acc.when(s === best, l)
    }.otherwise("unknown")
  }

  /** 0–4 integer quality score: length, punctuation, stopword density,
    * mean token length. */
  def qualityScore(text: Column): Column = {
    val checks = Seq(
      nTokens(text) >= 20,
      punctRatio(text) <= 0.1,
      stopwordRatio(text).between(0.05, 0.6),
      avgTokenLen(text).between(3.0, 12.0))
    checks.map(c => when(c, 1).otherwise(0)).reduce(_ + _)
  }

  /** Exact-dedup fingerprint: md5 of lowercased text with punctuation
    * stripped and whitespace collapsed. */
  def fingerprint(text: Column): Column = md5(stats(text).getField("norm"))

  /** Exact-duplicate groups: one row per fingerprint with group size and
    * canonical (minimum) doc id. Hash-groupBy — the exact-dedup primitive. */
  def exactDuplicateGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), fingerprint(text).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))

  /** Gopher/C4-style repetition signals in one native pass
    * ([[graft.expressions.RepStatsExpr]]): struct(top2_cover,
    * top3_cover, dup_line_chars) — characters covered by the
    * most-covering word 2-/3-gram and by duplicated lines. Ratios are
    * cover / length(text) at the call site. */
  def repStats(text: Column): Column = call_function("rep_stats", text)

  /** Rabin–Karp polynomial rolling hash of the whole text:
    * h = ((c1*B + c2)*B + c3)... mod P over the code points, one native
    * pass ([[graft.expressions.RollingHashExpr]]). Empty/null text → 0. */
  def rollingHash(text: Column, b: Long = 31L, p: Long = 2147483647L): Column =
    coalesce(call_function("rolling_hash", text, lit(b), lit(p)), lit(0L))

  /** Corpus vocabulary statistics — the document-frequency primitive
    * behind IDF weighting, stopword discovery and contamination-prone
    * hot-term analysis: one row per lowercased whitespace token with its
    * total occurrence count (tf) and distinct-document count (df), df
    * filtered at `minDf`. Both aggregates are map-side combinable (the
    * df arm distincts (term, doc) before counting); the only exchange is
    * the hash shuffle by term, and Zipf's law makes hot terms exactly
    * the ones a top-k consumer wants — AQE handles the skew, nothing
    * serializes into a window. */
  def vocabStats(docs: DataFrame, id: Column, text: Column,
                 minDf: Int = 1): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val tok = docs.select(id.as("doc_id"),
      explode(lowerTokens(text)).as("term"))
    tok.groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
  }

  /** Mean unigram surprisal per document, in nats — the CCNet-style
    * "perplexity filter" with the corpus's OWN unigram model (no
    * external LM): score = -(Σ_t tf_t · ln(cnt_t / N)) / dl. Extremes
    * flag both boilerplate (low — every token common) and garbage (high
    * — tokens the corpus has never seen elsewhere). Shape: one
    * tokenize+tf pass (map-combinable), the global counts join back on
    * the term key, and the per-document sum folds in TERM-SORTED order
    * (the q55 bit-stability trick — a plain float SUM would drift with
    * partitioning). Docs with no tokens yield null. Oracle: q75. */
  def unigramSurprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val withLen = docs.select(id.as("doc_id"), lowerTokens(text).as("_toks"))
      .select(col("doc_id"),
        coalesce(size(col("_toks")), lit(0)).cast("long").as("dl"),
        col("_toks"))
    val tf = withLen
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val global = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = global.agg(sum(col("cnt")).as("n")) // 1 row, broadcasts
    val contrib = tf.join(global, "term").crossJoin(broadcast(total))
      .withColumn("c",
        col("tf").cast("double") * log(col("cnt").cast("double") / col("n")))
    val summed = contrib.groupBy(col("doc_id"), col("dl"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("c")).as("s"))
    withLen.select(col("doc_id"), col("dl"))
      .join(summed, Seq("doc_id", "dl"), "left")
      .select(col("doc_id"), col("dl"),
        round(-col("s") / col("dl"), 4).as("surprisal"))
  }

  // ------------------------------------------------------ PII redaction
  /** The pre-training scrub pass: emails, IPv4s and phone-shaped number
    * runs replaced with sentinel tokens. Patterns use only constructs
    * with identical semantics in Java regex and RE2 (no lookaround, no
    * backreferences), so the DuckDB oracle reproduces the exact output;
    * per-row projection — no shuffle, codegen'd regexp_replace.
    * Order matters: emails first (their local part can contain digits),
    * then IPs (dotted quads would otherwise part-match as phones), then
    * phones. A heuristic, as all regex PII scrubbing is: a 9-15-digit
    * grouped id also redacts as <PHONE> — the conservative direction for
    * a corpus scrub — while the boundary anchors keep the match
    * all-or-nothing: a 16+-digit run (e.g. a card number) is left intact
    * rather than partially consumed with a digit fragment dangling after
    * the sentinel (round-5 review). `(?:\\+|\\b)` instead of a plain \\b
    * because '+' is a non-word char — a leading boundary would never
    * match after a space. */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PiiPhoneRe =
    "(?:\\+|\\b)[0-9]{1,3}[-. ]?\\(?[0-9]{2,4}\\)?[-. ]?[0-9]{3,4}[-. ]?[0-9]{3,4}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "<EMAIL>"),
        PiiIpRe, "<IP>"),
      PiiPhoneRe, "<PHONE>")

  // ------------------------------------------------------------------
  // Round-2 regex formulations — independent references for the specs'
  // bit-equality assertions (and for sessions without GraftExtensions).
  // ------------------------------------------------------------------

  private def stopHits(toks: Column, lang: String): Column =
    size(filter(toks, t =>
      Stopwords(lang).map(s => t === s).reduce(_ || _)))

  def nTokensRegex(text: Column): Column = size(tokens(text))

  def nSubtokensRegex(text: Column): Column =
    size(regexp_extract_all(text, lit(SubtokenRe), lit(0)))

  def punctRatioRegex(text: Column): Column =
    round(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      nullif(length(text), lit(0)), 4)

  def stopwordRatioRegex(text: Column): Column =
    round(stopHits(tokens(text), "en").cast("double") / nTokensRegex(text), 4)

  def avgTokenLenRegex(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") / nTokensRegex(text)

  def langIdRegex(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangOrder.map(l => l -> stopHits(toks, l))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, "unknown")) { case (acc, (l, s)) =>
      acc.when(s === best, l)
    }.otherwise("unknown")
  }

  def fingerprintRegex(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " ")))

  def rollingHashHof(text: Column, b: Long = 31L, p: Long = 2147483647L): Column =
    when(length(text) > 0,
      aggregate(regexp_extract_all(text, lit("."), lit(0)), lit(0L),
        (acc, c) => (acc * b + ascii(c)) % p))
      .otherwise(0L)
}
