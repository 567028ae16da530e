package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `wordpiece_encode(text) → array<string>`
  * — BERT-style greedy longest-match-first segmentation under the
  * checked-in WordPiece vocabulary; unmatchable or over-length words
  * become `[UNK]` whole (see [[graft.llm.WordPiece]]).
  *
  * Same scale shape as [[UnigramEncodeExpr]]: a pure per-row projection
  * inside whole-stage codegen — no shuffle, no state, artifact resolved
  * once per JVM from the classpath. */
case class WordPieceEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override protected def nullSafeEval(t: Any): Any =
    WordPieceEncode.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.WordPieceEncode.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}

object WordPieceEncode {
  def compute(text: UTF8String): ArrayData = {
    val toks = graft.llm.WordPiece.encode(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
