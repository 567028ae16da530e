package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `gram_hashes(string, k) → array<long>` —
  * the Rabin–Karp hash of EVERY k-code-point window of the text, in
  * position order (array index i = the gram starting at code point i),
  * ONE incremental pass per document.
  *
  * Same base/modulus chain as [[WinnowExpr]] (B=31 mod 2^31-1, matching
  * [[RollingHashExpr]]) so a DuckDB `list_reduce` fold reproduces every
  * value. Where winnowing keeps only window minima (a sampled sketch for
  * span DETECTION), this keeps all positions — the input to exact
  * duplicated-substring REMOVAL, where every covered position matters.
  * Texts shorter than k code points yield an empty array; null text
  * yields null.
  */
case class GramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 2, s"gram_hashes needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GramHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

object GramHashes {
  import Winnow.{B, P}

  def compute(text: UTF8String, k: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(new Array[Any](0))
    var pow = 1L
    var e = 0
    while (e < k - 1) { pow = pow * B % P; e += 1 }
    val gh = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    gh(0) = h
    i = 1
    while (i < nGrams) {
      h = ((h - cps(i - 1) * pow % P + P) % P * B + cps(i + k - 1)) % P
      gh(i) = h
      i += 1
    }
    new GenericArrayData(gh)
  }
}
