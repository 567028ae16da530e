package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `bounded_levenshtein(a, b, maxd) → int` —
  * the code-point Levenshtein distance of `a` and `b` when it is
  * `<= maxd`, and the sentinel `maxd + 1` ("greater than the bound")
  * otherwise.
  *
  * The unbounded builtin fills the full `|a|×|b|` DP matrix per pair —
  * O(L²) with no way out — which makes the VERIFY stage of an
  * edit-distance near-dup join (q96) the scale bottleneck: candidates
  * arrive pre-filtered to a relative-distance band, so for long
  * documents almost all of the matrix is provably irrelevant. This is
  * the Ukkonen banded form: only the `2·maxd+1` diagonal band is
  * computed (O(maxd·L) time, two O(L) rows of memory) and the walk
  * exits the moment an entire band row exceeds `maxd` — for a
  * rejected pair that is typically after a few rows, not after L.
  *
  * Spark's own `levenshtein(l, r, threshold)` overload bounds the
  * distance too, but takes the threshold as a constant — useless when
  * the bound is per-pair (`maxd = floor(0.25 * greatest(len_a,
  * len_b))`). Here `maxd` is an ordinary child expression.
  *
  * Contract (asserted in PropertySpec):
  *  - distance semantics are CODE POINT, matching the builtin
  *    `levenshtein` (surrogate pairs count once);
  *  - `result == levenshtein(a, b)` whenever `levenshtein(a, b) <= maxd`;
  *  - `result == maxd + 1` whenever the true distance exceeds `maxd`;
  *  - `maxd < 0` is treated as 0 (only equality survives the bound);
  *  - null if any input is null.
  */
case class BoundedLevenshteinExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, m) => TypeCheckResult.TypeCheckFailure(
        s"bounded_levenshtein requires (string, string, int), got " +
          s"${a.simpleString}, ${b.simpleString}, ${m.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bounded_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
    BoundedLevenshtein.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) =>
      s"${ev.value} = graft.expressions.BoundedLevenshtein.compute($a, $b, $m);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BoundedLevenshteinExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BoundedLevenshtein {

  def compute(a: UTF8String, b: UTF8String, maxdRaw: Int): Int = {
    val maxd = if (maxdRaw < 0) 0 else maxdRaw
    // Code points, not UTF-16 chars: the builtin levenshtein counts a
    // surrogate pair as one edit unit and the spec pins equality.
    val ca = a.toString.codePoints().toArray
    val cb = b.toString.codePoints().toArray
    computeCp(ca, cb, maxd)
  }

  def computeCp(a: Array[Int], b: Array[Int], maxd: Int): Int = {
    val la = a.length
    val lb = b.length
    val inf = maxd + 1
    if (math.abs(la - lb) > maxd) return inf
    if (la == 0) return lb // <= maxd by the length guard
    if (lb == 0) return la
    var prev = new Array[Int](lb + 1)
    var curr = new Array[Int](lb + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    val j0 = math.min(lb, maxd)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      java.util.Arrays.fill(curr, inf)
      val lo = math.max(1, i - maxd)
      val hi = math.min(lb, i + maxd)
      var rowMin = inf
      if (lo == 1 && i <= maxd) { curr(0) = i; rowMin = i }
      val ai = a(i - 1)
      var jj = lo
      while (jj <= hi) {
        val sub = prev(jj - 1) + (if (ai == b(jj - 1)) 0 else 1)
        val del = prev(jj) + 1
        val ins = curr(jj - 1) + 1
        var v = if (del < sub) del else sub
        if (ins < v) v = ins
        if (v > inf) v = inf
        curr(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      // Early exit: every cell in the band already exceeds maxd, and
      // band values never decrease down the rows — the pair is
      // rejected without touching the remaining (la - i) rows.
      if (rowMin >= inf) return inf
      val t = prev; prev = curr; curr = t
      i += 1
    }
    math.min(prev(lb), inf)
  }
}
