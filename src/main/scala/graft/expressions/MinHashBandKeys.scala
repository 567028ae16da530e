package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.MinHashLsh

/** Native Catalyst expression: `minhash_band_keys(array<long>) →
  * array<string>` — the 16 LSH band keys of a shingle-hash set in ONE
  * pass.
  *
  * Why a custom Expression instead of the HOF composition
  * (64 × `array_min(transform(hs, ...))` + 16 × `md5(concat_ws(...))`):
  *  - the composition walks the hash array 64 times and allocates 64
  *    intermediate arrays per row; this walks it once, O(n·perms) with
  *    two scalar registers per permutation;
  *  - it operates on `ArrayData` directly (no Scala converter SerDe a
  *    UDF would pay) and participates in whole-stage codegen via
  *    `doGenCode` (a static call into [[MinHashBandKeys.compute]] — the
  *    StaticInvoke pattern used by Spark's own collection expressions).
  *
  * Bit-identical to the HOF path (asserted in LlmTextSpec): same
  * coefficients, same decimal rendering, same md5.
  *
  * Registered as a SQL function by [[graft.GraftExtensions]].
  */
case class MinHashBandKeysExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashBandKeys.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeysExpr =
    copy(child = newChild)
}

object MinHashBandKeys {
  import MinHashLsh.{Bands, NumPerms, P, RowsPerBand}

  private val A: Array[Long] = (0 until NumPerms).map(MinHashLsh.aCoef).toArray
  private val B: Array[Long] = (0 until NumPerms).map(MinHashLsh.bCoef).toArray

  /** One pass over the hash set → 16 md5 band keys. Called from both the
    * interpreted eval and the generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < NumPerms) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val keys = new Array[Any](Bands)
    var b = 0
    while (b < Bands) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < RowsPerBand) {
        if (j > 0) sb.append('_')
        sb.append(mins(b * RowsPerBand + j))
        j += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new java.lang.StringBuilder(32)
      dig.foreach(x => hex.append(f"${x & 0xff}%02x"))
      keys(b) = UTF8String.fromString(hex.toString)
      b += 1
    }
    new GenericArrayData(keys)
  }
}
