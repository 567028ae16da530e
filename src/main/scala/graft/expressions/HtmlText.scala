package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `html_text(html) → string` — boilerplate
  * text extraction from an HTML payload, the C4/CCNet web-corpus
  * front-end step (strip markup, keep the prose).
  *
  * The semantics are DEFINED by the sequential replace chain in
  * [[graft.llm.Html.htmlTextRegex]] (six passes: comments, script
  * elements, style elements, remaining tags → space, basic entity
  * decode, whitespace collapse + trim); this expression hand-rolls each
  * pass in order so the output is byte-identical to the chain (asserted
  * in HtmlSpec) while never touching a regex engine. Pass order
  * matters and is preserved: entities decode AFTER tag stripping, so
  * `&lt;script&gt;` in the prose can never be taken for markup; each
  * pass scans its input left-to-right without re-scanning its own
  * output, matching global-replace semantics.
  *
  * This is intentionally a SIMPLE scanner, not an HTML5 tree builder:
  * a `>` inside a quoted attribute value ends the tag, unterminated
  * constructs pass through literally, and only the six basic named
  * entities decode. Every such choice is deterministic and mirrored
  * exactly by the regex chain and the DuckDB oracle (q86).
  */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_text requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HtmlText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlTextExpr =
    copy(child = newChild)
}

object HtmlText {

  def compute(html: UTF8String): UTF8String = {
    var s = html.toString
    s = stripComments(s)          // (?s)<!--.*?-->            → ''
    s = stripElement(s, "script") // (?is)<script\b[^>]*>.*?</script[ \t\n\r]*> → ''
    s = stripElement(s, "style")
    s = stripTags(s)              // (?s)<[^>]*>               → ' '
    s = decodeEntities(s)
    s = collapseWs(s)             // [ \t\n\r\f]+ → ' ', then trim
    UTF8String.fromString(s)
  }

  /** `(?s)<!--.*?-->` → "". Non-greedy: each comment ends at the first
    * `-->` after its opener; an opener with no terminator anywhere after
    * it stays literal (and so does everything later — no terminator can
    * serve any later opener either). */
  private def stripComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      val end = s.indexOf("-->", i + 4)
      if (end < 0) i = -1
      else {
        sb.append(s, pos, i)
        pos = end + 3
        i = s.indexOf("<!--", pos)
      }
    }
    sb.append(s, pos, s.length)
    sb.toString
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isHtmlWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** `(?is)<name\b[^>]*>.*?</name[ \t\n\r]*>` → "". Leftmost-first: a
    * candidate opener that can't complete a match (missing `>` or no
    * well-formed closer after it) is skipped and the scan resumes one
    * char later, exactly as the regex engine advances its start. */
  private def stripElement(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    var search = 0
    while (search < s.length) {
      val i = indexOfIgnoreCase(s, open, search)
      if (i < 0) {
        sb.append(s, pos, s.length)
        return sb.toString
      }
      val after = i + open.length
      if (after < s.length && isWordChar(s.charAt(after))) search = i + 1 // \b fails
      else {
        val gt = s.indexOf('>', after)
        if (gt < 0) { // no tag end anywhere after: no match here or later
          sb.append(s, pos, s.length)
          return sb.toString
        }
        // earliest close: `</name` then optional [ \t\n\r]* then '>'
        var c = indexOfIgnoreCase(s, close, gt + 1)
        var endPos = -1
        while (c >= 0 && endPos < 0) {
          var j = c + close.length
          while (j < s.length && isHtmlWs(s.charAt(j))) j += 1
          if (j < s.length && s.charAt(j) == '>') endPos = j + 1
          else c = indexOfIgnoreCase(s, close, c + 1)
        }
        if (endPos < 0) search = i + 1
        else {
          sb.append(s, pos, i)
          pos = endPos
          search = endPos
        }
      }
    }
    sb.append(s, pos, s.length)
    sb.toString
  }

  /** `(?s)<[^>]*>` → " ". Each tag ends at the first `>` after its `<`
    * (a `<` with no `>` after it stays literal, as does the tail). */
  private def stripTags(s: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      val gt = s.indexOf('>', i + 1)
      if (gt < 0) i = -1
      else {
        sb.append(s, pos, i).append(' ')
        pos = gt + 1
        i = s.indexOf('<', pos)
      }
    }
    sb.append(s, pos, s.length)
    sb.toString
  }

  /** The six basic named entities, in the chain's order — `&amp;` LAST,
    * so `&amp;lt;` decodes to the literal text `&lt;` (single-decode,
    * the HTML-correct result for sequential replaces). */
  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  /** `[ \t\n\r\f]+` → " ", then trim the (single possible) leading and
    * trailing space — matching `trim(regexp_replace(..))`. */
  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inWs = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!inWs) sb.append(' ')
        inWs = true
      } else {
        sb.append(c)
        inWs = false
      }
      i += 1
    }
    var st = 0
    var en = sb.length
    if (en > st && sb.charAt(st) == ' ') st += 1
    if (en > st && sb.charAt(en - 1) == ' ') en -= 1
    sb.substring(st, en)
  }
}
