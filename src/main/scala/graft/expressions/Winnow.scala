package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `winnow_fingerprints(string, k, w) →
  * array<long>` — the distinct winnowing fingerprints of a text
  * (Schleimer, Wilkerson, Aiken, SIGMOD '03: the MOSS document-
  * fingerprinting scheme), sorted ascending, ONE pass per document.
  *
  * Chain: Rabin–Karp hashes of every k-code-point window (base 31 mod
  * 2147483647, matching [[RollingHashExpr]]'s parameters so a DuckDB
  * `list_reduce` fold reproduces every value), then the MINIMUM hash of
  * each w consecutive k-gram hashes, deduplicated. The winnowing
  * guarantee: two documents sharing any substring of at least
  * w + k - 1 code points share at least one selected fingerprint —
  * which makes the fingerprint equi-join a complete detector for long
  * duplicated spans (the ExactSubstr signal) without comparing texts.
  *
  * The k-gram hashes are computed incrementally (drop leading char,
  * append trailing) and the window minima with a monotonic deque — both
  * O(n) — so the projection stays linear in text size. Texts shorter
  * than k + w - 1 code points yield an empty array.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2, s"winnow_fingerprints needs k >= 2, got $k")
  require(w >= 1, s"winnow_fingerprints needs w >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Winnow.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object Winnow {
  val B = 31L
  val P = 2147483647L

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val nGrams = cps.length - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return new GenericArrayData(new Array[Any](0))
    // b^(k-1) mod p, for the incremental leading-char removal
    var pow = 1L
    var e = 0
    while (e < k - 1) { pow = pow * B % P; e += 1 }
    // k-gram hashes, incrementally: h_{i+1} = (h_i - c_i·b^(k-1))·b + c_{i+k}
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
    // sliding min over w hashes via monotonic deque (indices, increasing
    // hash value front to back); collect each window's min
    val mins = new Array[Long](nWins)
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      while (tail > head && gh(dq(tail - 1)) >= gh(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - (w - 1)) = gh(dq(head))
      i += 1
    }
    SortedDistinct.toArrayData(mins, nWins)
  }
}
