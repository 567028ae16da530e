package graft

import org.apache.spark.sql.functions._
import graft.llm.Html

class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def native(h: String): String =
    Seq(Tuple1(h)).toDF("h").select(Html.htmlText(col("h")).as("t"))
      .as[String].head()

  test("html_text decision table: the simple-scanner semantics, pinned") {
    val cases = Seq(
      // plain structure: tags → space, collapse, trim
      "<html><body><p>hello</p> <p>world</p></body></html>" -> "hello world",
      // comments vanish, including markup inside them
      "a<!-- <p>hidden</p> -->b" -> "ab",
      // unterminated comment survives pass 1 literally — and then the
      // tag pass eats `<!-- open <p>` as one tag (first < to first >)
      "a<!-- open <p>x" -> "a x",
      // script/style vanish WITH content, case-insensitive, ws before >
      "<SCRIPT>var x = 1 < 2;</SCRIPT>kept" -> "kept",
      "<style media=\"all\">p { color: red; }</style\n>kept" -> "kept",
      // \b: <scripty> is NOT a script element — plain tag → space
      "<scripty>text</scripty>" -> "text",
      // a failed closer candidate is skipped, the real one closes
      "<script>var s = \"</scriptx>\";</script>done" -> "done",
      // > inside a quoted attribute ends the tag (documented limit)
      "<a title=\"a>b\">link</a>" -> "b\">link",
      // entities decode AFTER tag strip; &amp; last = single-decode
      "&lt;p&gt; &amp;lt; &quot;q&quot; &#39;s&#39; x&nbsp;y" ->
        "<p> &lt; \"q\" 's' x y",
      // unterminated tag stays literal
      "before <unclosed" -> "before <unclosed",
      // whitespace collapse covers \t \n \r \f
      "a\t\n\r\fb" -> "a b",
      "" -> "",
      "   " -> "")
    for ((in, want) <- cases)
      assert(native(in) == want, s"input: $in")
  }

  test("native html_text is byte-identical to the defining regex chain") {
    // the q86 template family over real documents, plus adversarial
    // hand cases: comment-in-script, script-in-comment, nested openers,
    // every entity, astral code points, bare & and <
    val docs = sparkTables().select(col("doc_id"), col("text"))
    val templated = docs.select(
      Html.syntheticPage(col("doc_id"), col("text")).as("h"))
    val hand = Seq(
      "<script><!-- </script> --> more</script>x",
      "<!-- <script> -->no script here</p>",
      "<script src=a><script></script>tail",
      "&amp;amp; &amp;lt; &lt;&gt;&quot;&#39;&nbsp;&amp;",
      "emoji 😀 <b>boldé</b> 中文",
      "5 < 6 but & stays",
      "<p\nclass=\"x\">multi\nline</p\t>",
      "<style>a</style",
      "<!---->edge<!-- -->").toDF("h")
    val all = templated.unionByName(hand)
    val diff = all.select(
        Html.htmlText(col("h")).as("n"), Html.htmlTextRegex(col("h")).as("r"))
      .filter(not(col("n") <=> col("r")))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("null html → null text, in both formulations") {
    val df = Seq[Option[String]](None, Some("<p>x</p>")).toDF("h")
    val out = df.select(Html.htmlText(col("h")).as("n"),
      Html.htmlTextRegex(col("h")).as("r")).collect()
    assert(out.map(r => r.isNullAt(0)).toSeq == Seq(true, false))
    assert(out.map(r => r.isNullAt(1)).toSeq == Seq(true, false))
  }

  private def sparkTables() =
    graft.sources.Tables.documents(spark, sf)
}
