package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `simhash60(string) → bigint` — the
  * 60-bit SimHash fingerprint of a whitespace-tokenized text in ONE pass
  * per document.
  *
  * Replaces the distributed formulation in
  * [[graft.llm.SimHash.fingerprints]] (explode tokens → md5-hex →
  * conv(16,10) → groupBy(doc) with SIXTY `sum(when(bit, 1, -1))`
  * aggregates): that shape shuffles every (doc, token) row and carries a
  * 60-column aggregation buffer; this one computes the fingerprint as a
  * pure projection — no explode, no shuffle, whole-stage codegen.
  * The aggregation was never semantically needed: a document's
  * fingerprint depends only on its own tokens.
  *
  * BIT-IDENTICAL to the distributed path (asserted in LlmTextSpec):
  * same `\s+` tokenizer (including split's leading empty token), token
  * hash = first 15 md5 hex digits = top 60 bits of the digest, per-bit
  * vote +1/−1 with term multiplicity, bit set iff vote sum > 0.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

object SimHash60 {
  private val Ws = Pattern.compile("\\s+")
  val Bits = 60

  /** Top 60 bits of md5(s) — the value of the first 15 hex digits. */
  def md5Top60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def compute(text: UTF8String): Long = {
    val toks = Ws.split(text.toString, -1)
    val votes = new Array[Int](Bits)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      val h = md5Top60(md, toks(i))
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}
