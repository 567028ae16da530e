package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: `top_cells(embedding) → array<int>` — the
  * `nProbe` IVF cells closest to a vector, in (score desc, cid asc)
  * order, in ONE pass over the centroid matrix.
  *
  * The centroid matrix is runtime data (a deterministic sample collected
  * by [[graft.llm.Similarity.centroidSeq]]), so this expression is NOT
  * SQL-registered; it carries the matrix as a constructor field and
  * [[graft.llm.Similarity]] builds it directly. Codegen references the
  * matrix via `addReferenceObj` — the generated code still runs inside
  * whole-stage codegen.
  *
  * Replaces the HOF formulation in `Similarity.assignCells`/`ivfTopK`
  * (nCells × `aggregate(zip_with(...))` interpreted lambdas, plus an
  * `array_sort` over score structs, per row — and the score array
  * expression was duplicated between array_position and array_max).
  *
  * BIT-IDENTICAL ordering (asserted in SimilaritySpec): score =
  * dot(e, c) / ||c|| with left-to-right double accumulation, ||c||
  * computed exactly as the HOF's literal (math.sqrt of the Scala sum);
  * ranking by java.lang.Double.compare on the negated score (Catalyst's
  * double struct ordering), cid ascending on ties.
  */
case class TopCellsExpr(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_cells requires array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val norms: Array[Double] = TopCells.norms(cents)

  override protected def nullSafeEval(input: Any): Any =
    TopCells.compute(input.asInstanceOf[ArrayData], isFloat, cents, norms, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TopCells.compute($c, $isFloat, $centsRef, $normsRef, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCellsExpr =
    copy(child = newChild)

  // Array fields break case-class equality/hashCode (reference identity);
  // compare contents so plan canonicalization can dedup equal expressions.
  override def equals(other: Any): Boolean = other match {
    case t: TopCellsExpr =>
      child == t.child && nProbe == t.nProbe &&
        cents.length == t.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), t.cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + nProbe) + cents.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

object TopCells {
  /** ||c|| per centroid — the same Scala expression the HOF path folded
    * into its literal, so the constant is bit-identical. */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  def compute(emb: ArrayData, isFloat: Boolean, cents: Array[Array[Double]],
              norms: Array[Double], nProbe: Int): ArrayData = {
    val nCells = cents.length
    val n = emb.numElements()
    // A dimension-mismatched embedding gets NO cells (empty array → the
    // vector drops out of the candidate explode) instead of a plausible-
    // looking ranking over the common prefix — the mismatch case is
    // defined explicitly, like LshSigs (round-3 advice).
    if (nCells == 0 || n != cents(0).length) return new GenericArrayData(new Array[Any](0))
    val e = new Array[Double](n)
    var d = 0
    while (d < n) {
      e(d) = if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)
      d += 1
    }
    val ns = new Array[Double](nCells) // negated scores
    val idx = new Array[Int](nCells)
    var i = 0
    while (i < nCells) {
      val c = cents(i)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += e(j) * c(j); j += 1 }
      ns(i) = -(dot / norms(i))
      idx(i) = i
      i += 1
    }
    // insertion sort by (Double.compare(ns), cid asc) — nCells is small
    i = 1
    while (i < nCells) {
      val kn = ns(i); val ki = idx(i)
      var j = i - 1
      while (j >= 0 && {
        val c = java.lang.Double.compare(ns(j), kn)
        c > 0 || (c == 0 && idx(j) > ki)
      }) {
        ns(j + 1) = ns(j); idx(j + 1) = idx(j); j -= 1
      }
      ns(j + 1) = kn; idx(j + 1) = ki
      i += 1
    }
    val k = math.min(nProbe, nCells)
    val out = new Array[Any](k)
    i = 0
    while (i < k) { out(i) = idx(i); i += 1 }
    new GenericArrayData(out)
  }
}
