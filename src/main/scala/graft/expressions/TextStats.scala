package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.TextOps

/** Native Catalyst expression: `text_stats(string) → struct` — every
  * integer ingredient of the text-quality operators in ONE pass over the
  * text, plus the exact-dedup normalized form:
  *
  *   n_tokens     `size(split(text, '\s+'))` (incl. split's leading
  *                empty token on leading whitespace)
  *   n_subtokens  matches of `[A-Za-z0-9]+|[^A-Za-z0-9\s]` (alnum runs
  *                count 1, every other non-space code point counts 1)
  *   n_punct      code points matching `[^A-Za-z0-9\s]`
  *   n_nonws      code points not matching `\s`
  *   n_chars      `length(text)` in code points
  *   s_en/de/es/fr  whitespace tokens equal to a stopword of that
  *                language (multiplicity counts, case-sensitive)
  *   norm         `trim(regexp_replace(regexp_replace(lower(text),
  *                '[^a-z0-9\s]', ''), '\s+', ' '))`
  *
  * Replaces five separate regex passes per document
  * (split + regexp_extract_all + 2× regexp_replace + stopword HOF
  * filters ×4 languages) in [[graft.llm.TextOps]]. The derived ratios /
  * language vote / quality score stay as Column arithmetic over these
  * fields, so rounding and null semantics are unchanged; when several
  * output columns read different fields, whole-stage codegen's
  * subexpression elimination evaluates the struct once per row.
  *
  * Java `\s` here is exactly the regex class `[ \t\n\x0B\f\r]` — no
  * Unicode spaces — matching the Pattern-based formulations replaced.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subtokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("norm", StringType, nullable = false)))

  private val Ws = Pattern.compile("\\s+")

  private val stopSets: Array[java.util.HashSet[String]] =
    TextOps.LangOrder.map { l =>
      val s = new java.util.HashSet[String]()
      TextOps.Stopwords(l).foreach(s.add)
      s
    }.toArray

  @inline private def isWs(cp: Int): Boolean = // Java regex \s
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  @inline private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    // --- code-point scan: subtokens / punct / whitespace / length ---
    var nSub, nPunct, nWs, nChars = 0
    var inAlnumRun = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isWs(cp)) { nWs += 1; inAlnumRun = false }
      else if (isAlnum(cp)) {
        if (!inAlnumRun) { nSub += 1; inAlnumRun = true }
      } else {
        nSub += 1; nPunct += 1; inAlnumRun = false
      }
      i += Character.charCount(cp)
    }
    // --- token scan: count + stopword votes ---
    val toks = Ws.split(s, -1)
    val votes = new Array[Int](stopSets.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < stopSets.length) {
        if (stopSets(l).contains(toks(t))) votes(l) += 1
        l += 1
      }
      t += 1
    }
    // --- normalized form over the lowercased text: keep [a-z0-9], fold
    //     each separating whitespace run to one space, drop the rest ---
    val lower = text.toLowerCase.toString
    val norm = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      if (isWs(cp)) { if (norm.length() > 0) pendingSpace = true }
      else if (cp >= 'a' && cp <= 'z' || cp >= '0' && cp <= '9') {
        if (pendingSpace) { norm.append(' '); pendingSpace = false }
        norm.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](
      toks.length, nSub, nPunct, nChars - nWs, nChars,
      votes(0), votes(1), votes(2), votes(3),
      UTF8String.fromString(norm.toString)))
  }
}
