package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `bpe_encode(text) → array<string>` — the
  * deterministic char-level BPE tokens of `text` under the checked-in
  * merge table (see [[graft.llm.Bpe]] for the pinned semantics and why
  * the vocab is a versioned artifact).
  *
  * Scale shape: a pure per-row projection inside whole-stage codegen —
  * no shuffle, no state, merge table resolved once per JVM from the
  * classpath (executors get it with the jar, the broadcast nobody has to
  * manage). Token COUNTS for packing/chunking budgets are
  * `size(bpe_encode(text))`; the array itself feeds chunk assembly and
  * the q116 oracle gate.
  */
case class BpeEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(t: Any): Any =
    BpeEncode.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.BpeEncode.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncode {
  def compute(text: UTF8String): ArrayData = {
    val toks = graft.llm.Bpe.encode(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def computeIds(text: UTF8String): ArrayData =
    new GenericArrayData(graft.llm.Bpe.encodeIds(text.toString))
}

/** `bpe_encode_ids(text) → array<int>` — the id stream under the
  * checked-in vocab (id 0 = unk for out-of-vocab code points): what a
  * training manifest actually stores and a sequence assembler packs.
  * Same zero-shuffle per-row shape as [[BpeEncodeExpr]]. */
case class BpeEncodeIdsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids requires string, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override protected def nullSafeEval(t: Any): Any =
    BpeEncode.computeIds(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.BpeEncode.computeIds($t);")

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIdsExpr =
    copy(child = newChild)
}
