package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `unigram_encode(text) → array<string>` —
  * the unigram-LM (SentencePiece-style) segmentation of `text` under
  * the checked-in piece table: per-word Viterbi decode, unknown
  * characters as `<unk>` (see [[graft.llm.UnigramLm]] for the pinned
  * DP order and tie rule).
  *
  * Same scale shape as [[BpeEncodeExpr]]: a pure per-row projection
  * inside whole-stage codegen — no shuffle, no state, artifact
  * resolved once per JVM from the classpath. */
case class UnigramEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override protected def nullSafeEval(t: Any): Any =
    UnigramEncode.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.UnigramEncode.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncode {
  def compute(text: UTF8String): ArrayData = {
    val toks = graft.llm.UnigramLm.encode(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
