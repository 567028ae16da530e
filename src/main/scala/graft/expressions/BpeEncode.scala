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

  /** Token count without building the token array's UTF8Strings. */
  def computeCount(text: UTF8String): Int =
    graft.llm.Bpe.encode(text.toString).length

  def computeDecode(ids: ArrayData): UTF8String = {
    // element-wise (not toIntArray): the input type admits null
    // elements, which decode as unk like any other unknown id
    val n = ids.numElements()
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) {
      arr(i) = if (ids.isNullAt(i)) Int.MinValue else ids.getInt(i)
      i += 1
    }
    UTF8String.fromString(graft.llm.Bpe.decodeIds(arr))
  }
}

/** `bpe_count(text) → int` — the BPE token COUNT without materializing
  * the token array: what every packing/chunking budget actually needs
  * (`size(bpe_encode(text))` builds one UTF8String per token and a
  * GenericArrayData just to take its length). The
  * [[graft.BpeCountRewrite]] optimizer rule substitutes this for
  * `size(bpe_encode(..))` automatically, so callers keep the readable
  * form and the plan gets the cheap one.
  *
  * `legacySizeOfNull` mirrors `Size`'s null contract so the rewrite is
  * semantics-preserving under either config: true → null text counts
  * -1 (the non-ANSI `size(NULL)` default), false → null. */
case class BpeCountExpr(child: Expression, legacySizeOfNull: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = if (legacySizeOfNull) false else child.nullable
  override def prettyName: String = "bpe_count"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) { if (legacySizeOfNull) -1 else null }
    else BpeEncode.computeCount(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val handleNull =
      if (legacySizeOfNull) s"${ev.value} = -1;"
      else s"${ev.isNull} = true;"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      int ${ev.value} = -1;
      if (${childGen.isNull}) {
        $handleNull
      } else {
        ${ev.value} = graft.expressions.BpeEncode.computeCount(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** `bpe_decode_ids(ids) → string` — the inverse projection of
  * [[BpeEncodeIdsExpr]]: in-order concatenation of the ids' token
  * strings under the same checked-in vocab (unknown ids render as
  * `<unk>` instead of failing the shard — see
  * [[graft.llm.Bpe.decodeIds]] for the pinned round-trip contract).
  * What an inspection/debug pass runs over a stored training manifest;
  * per-row, zero shuffle, vocab resolved once per JVM from the jar. */
case class BpeDecodeIdsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ids requires array<int>, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode_ids"

  override protected def nullSafeEval(ids: Any): Any =
    BpeEncode.computeDecode(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ids =>
      s"${ev.value} = graft.expressions.BpeEncode.computeDecode($ids);")

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIdsExpr =
    copy(child = newChild)
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
