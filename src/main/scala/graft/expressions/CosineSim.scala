package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: `cosine_d(array<float|double>,
  * array<float|double>) → double` — exact cosine similarity in one pass.
  *
  * Why a custom Expression instead of the HOF composition
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_) / (sqrt(...) * sqrt(...))`):
  * higher-order functions are CodegenFallback — every candidate pair in
  * the ANN/near-dup rerank paid an interpreted lambda per element and
  * broke the surrounding whole-stage-codegen span. This walks both
  * arrays once with three scalar accumulators and participates in
  * codegen via a static call (the pattern of
  * [[MinHashBandKeysExpr]]).
  *
  * BIT-IDENTICAL to the HOF path (asserted in SimilaritySpec): the dot
  * product and both norms accumulate left-to-right in double precision,
  * each element cast to double first — the same IEEE operation order, so
  * DuckDB oracles built against the HOF arithmetic keep matching.
  *
  * Registered as a SQL function by [[graft.GraftExtensions]].
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_d requires array<float|double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_d"
  // null on unequal-length inputs (below), not only on null inputs
  override def nullable: Boolean = true

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else CosineSim.compute(x, leftIsFloat, y, rightIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.CosineSim.compute($a, $leftIsFloat, $b, $rightIsFloat);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** One pass, three accumulators, strict left-to-right adds — the exact
    * IEEE operation order of the HOF formulation it replaces. Called from
    * both interpreted eval and generated code. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // Unequal lengths never reach here: the expression returns null for
    // them (matching the HOF formulation, where zip_with pads with null
    // and the aggregate sum nulls out).
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
