package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `rep_stats(string) → struct` — the
  * repetition signals of the Gopher/C4-style quality filters, one pass
  * per document:
  *
  *   top2_cover     max over word 2-grams (with multiplicity) of
  *                  count × gram length in code points — the characters
  *                  the most-covering bigram accounts for
  *   top3_cover     same for word 3-grams
  *   dup_line_chars Σ over lines occurring ≥ 2 times of
  *                  count × line length — characters inside duplicated
  *                  lines
  *
  * Ratios (cover / length(text)) stay Column arithmetic. The "cover"
  * maxima are scalars, so ties between different grams cannot make the
  * result ambiguous — both engines take MAX(count * len), not "the"
  * top gram. Token/line splitting matches `split(text, '\s+')` /
  * `split(text, '\n')` semantics (split keeps empty tokens).
  */
case class RepStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rep_stats requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = RepStats.schema
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("top2_cover", IntegerType, nullable = false),
    StructField("top3_cover", IntegerType, nullable = false),
    StructField("dup_line_chars", IntegerType, nullable = false)))

  private val Ws = Pattern.compile("\\s+")

  private def topCover(toks: Array[String], n: Int): Int = {
    if (toks.length < n) return 0
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var best = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cover = e.getValue *
        e.getKey.codePointCount(0, e.getKey.length)
      if (cover > best) best = cover
    }
    best
  }

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val toks = Ws.split(s, -1)
    val lineCounts = new java.util.HashMap[String, Integer]()
    s.split("\n", -1).foreach(l => lineCounts.merge(l, 1, (a, b) => a + b))
    var dup = 0
    val it = lineCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2)
        dup += e.getValue * e.getKey.codePointCount(0, e.getKey.length)
    }
    new GenericInternalRow(Array[Any](
      topCover(toks, 2), topCover(toks, 3), dup))
  }
}
