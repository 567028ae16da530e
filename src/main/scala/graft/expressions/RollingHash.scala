package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `rolling_hash(string[, b, p]) → bigint` —
  * the Rabin–Karp polynomial hash h = fold(c → (h·b + c) mod p) over the
  * text's code points in one pass.
  *
  * Replaces the HOF formulation in [[graft.llm.TextOps.rollingHash]]
  * (`aggregate(regexp_extract_all(text, '.'), ...)`), which runs a regex
  * match PER CHARACTER, materializes every character as a one-element
  * string in an array, and folds with an interpreted lambda — ~20 CPU-
  * core-seconds for 50k documents at sf0.1 (48 s wall on a contended
  * host, BENCH_r02), vs a single arithmetic pass here.
  *
  * BIT-IDENTICAL to the HOF path (asserted in LlmTextSpec):
  *  - Java regex `.` (no DOTALL) skips the five line terminators
  *    (LF, CR, NEL u0085, LS u2028, PS u2029) - this loop skips
  *    exactly those;
  *  - `ascii(c)` of a single-code-point match is the code point
  *    (Spark's Ascii does `substring(0,1).toString.codePointAt(0)`), and
  *    `codePointAt` is what the UTF-8 decode below yields;
  *  - empty text → 0 (the `when(length > 0 …).otherwise(0)` wrapper).
  */
case class RollingHashExpr(child: Expression, b: Long, p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RollingHash.compute($c, ${b}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHash {
  /** One pass over the code points. Called from both interpreted eval and
    * generated code. */
  def compute(text: UTF8String, b: Long, p: Long): Long = {
    val s = text.toString
    val n = s.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      // Java `.` default: any code point except the five line terminators
      if (cp != '\n' && cp != '\r' && cp != 0x85 && cp != 0x2028 && cp != 0x2029) {
        acc = (acc * b + cp) % p
      }
      i += Character.charCount(cp)
    }
    acc
  }
}
