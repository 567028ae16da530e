package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `cut_spans(text, starts, ends) → string`
  * — remove the code-point ranges [starts(i), ends(i)) from the text,
  * keeping everything else in order. The application step of exact
  * duplicated-substring dedup ([[graft.llm.SubstringDedup]]): spans
  * come from its interval merge, already sorted ascending and
  * non-overlapping; offsets are CODE POINTS (consistent with
  * `gram_hashes`), so astral characters count once.
  *
  * Total on any input: spans are clamped to [0, len], empty/inverted
  * spans are ignored, null in any argument yields null. One pass, one
  * output buffer.
  */
case class CutSpansExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"cut_spans requires (string, array<bigint>, array<bigint>), got " +
          s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "cut_spans"

  override protected def nullSafeEval(t: Any, s: Any, e: Any): Any =
    CutSpans.compute(t.asInstanceOf[UTF8String],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, e) =>
      s"${ev.value} = graft.expressions.CutSpans.compute($t, $s, $e);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CutSpansExpr =
    copy(first = f, second = s, third = t)
}

object CutSpans {
  def compute(text: UTF8String, starts: ArrayData, ends: ArrayData): UTF8String = {
    require(starts.numElements() == ends.numElements(),
      s"cut_spans: ${starts.numElements()} starts vs ${ends.numElements()} ends")
    val n = starts.numElements()
    if (n == 0) return text
    val cps = text.toString.codePoints().toArray
    val len = cps.length
    val sb = new java.lang.StringBuilder(text.numChars())
    var pos = 0
    var i = 0
    while (i < n) {
      val s = math.max(0, math.min(starts.getLong(i), len.toLong)).toInt
      val e = math.max(0, math.min(ends.getLong(i), len.toLong)).toInt
      if (e > s && e > pos) {
        val from = math.max(pos, s)
        var j = pos
        while (j < from) { sb.appendCodePoint(cps(j)); j += 1 }
        pos = e
      }
      i += 1
    }
    var j = pos
    while (j < len) { sb.appendCodePoint(cps(j)); j += 1 }
    UTF8String.fromString(sb.toString)
  }
}
