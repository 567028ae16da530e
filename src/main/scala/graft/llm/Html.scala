package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text boilerplate extraction — the C4/CCNet web-corpus
  * front-end step (reference scope: the engine consumes already-textual
  * GA payloads; a web-scale training pipeline starts one step earlier,
  * at the crawled page).
  *
  * The SEMANTICS are this sequential replace chain (each pass a single
  * global left-to-right replace over the previous pass's output):
  *
  *   1. `(?s)<!--.*?-->`                               → ''   (comments)
  *   2. `(?is)<script\b[^>]*>.*?</script[ \t\n\r]*>`   → ''   (script + content)
  *   3. `(?is)<style\b[^>]*>.*?</style[ \t\n\r]*>`     → ''   (style + content)
  *   4. `(?s)<[^>]*>`                                  → ' '  (any other tag)
  *   5. `&lt; &gt; &quot; &#39; &nbsp; &amp;` decode — `&amp;` LAST, so
  *      `&amp;lt;` yields literal `&lt;` (single-decode)
  *   6. `[ \t\n\r\f]+` → ' ', then trim
  *
  * Every construct is in the Java∩RE2 common subset, so the exact same
  * chain runs as the DuckDB oracle (q86) — and the production path,
  * [[graft.expressions.HtmlTextExpr]] (`html_text`), hand-rolls the six
  * passes in one expression call with no regex engine, asserted
  * byte-identical to this chain in HtmlSpec.
  *
  * Deliberately a simple scanner, not a tree builder: `>` inside a
  * quoted attribute ends the tag; unterminated constructs stay literal;
  * numeric entities other than `&#39;` pass through. Deterministic
  * everywhere, and honest about it — a page that needs real HTML5
  * error recovery should be parsed upstream.
  */
object Html {

  /** Production path: the native single-call expression. */
  def htmlText(html: Column): Column = call_function("html_text", html)

  /** Deterministic synthetic page around a document's text — six
    * template shapes cycling on `doc_id % 6`, chosen to exercise every
    * pass: style/script with hostile content, comments hiding markup,
    * the entity set, uppercase tags, a `>` inside a quoted attribute,
    * and a decoy closer. Mirrored verbatim in the q86 DuckDB oracle
    * (no apostrophes anywhere, so the SQL literals stay simple). */
  def syntheticPage(docId: Column, text: Column): Column = {
    val m = pmod(docId, lit(6))
    when(m === 0, concat(
        lit("<html><head><title>T</title><style type=\"text/css\">" +
          "p { color: red; }</style></head><body><p>"),
        text, lit("</p></body></html>")))
      .when(m === 1, concat(
        lit("<body><script type=\"text/javascript\">if (1 < 2 && x > 0) " +
          "{ f(\"hi\"); }</script><div class=\"main\">"),
        text, lit("</div></body>")))
      .when(m === 2, concat(
        lit("<p>before<!-- <p>hidden</p> secret --> "), text,
        lit("<!-- tail --></p>")))
      .when(m === 3, concat(
        lit("<p>a &amp;lt; b &lt;i&gt;it&lt;/i&gt; &quot;q&quot; " +
          "&#39;s&#39; x&nbsp;y "),
        text, lit("</p>")))
      .when(m === 4, concat(
        lit("<DIV CLASS=\"X\"><H1>"), text, lit("</H1><BR><hr/></DIV>")))
      .otherwise(concat(
        lit("<a title=\"a>b\" href=\"u\">"), text,
        lit("</a><SCRIPT>var s = \"x</scriptx>\";</SCRIPT>done")))
  }

  /** The chain that DEFINES the semantics (also the oracle's shape);
    * kept as the cross-check formulation, codegen'd builtins only. */
  def htmlTextRegex(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noScript = regexp_replace(noComments,
      "(?is)<script\\b[^>]*>.*?</script[ \\t\\n\\r]*>", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style[ \\t\\n\\r]*>", "")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }
}
