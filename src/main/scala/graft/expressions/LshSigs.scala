package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.Similarity

/** Native Catalyst expression: `lsh_sigs(array<float|double>) →
  * array<string>` — all [[Similarity.NumTables]] random-hyperplane
  * bucket signatures of an embedding in ONE pass.
  *
  * Replaces the HOF formulation in [[graft.llm.Similarity.signature]]:
  * NumTables × NumBits separate `aggregate(zip_with(emb, planeLit))`
  * lambdas, each interpreted (HOFs are CodegenFallback) and each
  * allocating a zipped intermediate array per row. Here the 24 plane
  * dots are plain fused loops over the raw ArrayData.
  *
  * BIT-IDENTICAL to the HOF path (asserted in SimilaritySpec): same
  * deterministic planes ([[Similarity.plane]]), same left-to-right
  * double accumulation starting at 0.0, bit '1' iff dot > 0. A vector
  * whose length differs from [[Similarity.Dims]] gets all-'0'
  * signatures — exactly what the HOF yields (zip_with pads with null,
  * the sum nulls out, `when(null > 0)` is false).
  */
case class LshSigsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs requires array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_sigs"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    LshSigs.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.LshSigs.compute($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): LshSigsExpr =
    copy(child = newChild)
}

object LshSigs {
  import Similarity.{Dims, NumBits, NumTables}

  /** planes(t*NumBits + j) = the Dims hyperplane weights for (t, j). */
  private val planes: Array[Array[Double]] =
    (for (t <- 0 until NumTables; j <- 0 until NumBits)
      yield Similarity.plane(t, j).toArray).toArray

  def compute(emb: ArrayData, isFloat: Boolean): ArrayData = {
    val out = new Array[Any](NumTables)
    if (emb.numElements() != Dims) {
      val zeros = UTF8String.fromString("0" * NumBits)
      var t = 0
      while (t < NumTables) { out(t) = zeros; t += 1 }
      return new GenericArrayData(out)
    }
    val e = new Array[Double](Dims)
    var d = 0
    while (d < Dims) {
      e(d) = if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)
      d += 1
    }
    val sig = new Array[Char](NumBits)
    var t = 0
    while (t < NumTables) {
      var j = 0
      while (j < NumBits) {
        val w = planes(t * NumBits + j)
        var dot = 0.0
        var i = 0
        while (i < Dims) { dot += e(i) * w(i); i += 1 }
        sig(j) = if (dot > 0) '1' else '0'
        j += 1
      }
      out(t) = UTF8String.fromString(new String(sig))
      t += 1
    }
    new GenericArrayData(out)
  }
}
