package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.MinHashLsh

/** Native Catalyst expression: `char_ngram_hash_set(string, n) →
  * array<long>` — the distinct mod-P 60-bit md5 hashes of a text's
  * character n-grams, sorted ascending, in ONE pass per document.
  *
  * The character-shingle counterpart of [[ShingleHashSetExpr]] (word
  * bigrams): char n-grams (n≈5) are the standard granularity for
  * near-dup detection on text without reliable word boundaries (CJK,
  * code, OCR output) and are robust to single-word edits.
  *
  * Windows advance by CODE POINT (so a DuckDB `substr(text, i, n)`
  * mirror — also code-point based — hashes identical strings). Texts
  * shorter than n code points yield an empty array. The sorted-distinct
  * output satisfies the [[SortedIntersectSizeExpr]] merge invariant, so
  * the PPJoin verification stage consumes it directly.
  */
case class CharNgramHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"char_ngram_hash_set needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hash_set requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharNgramHashSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashSetExpr =
    copy(child = newChild)
}

object CharNgramHashSet {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // code-point positions (cheap identity walk for BMP-only text)
    val cps = s.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(new Array[Any](0))
    val md = MessageDigest.getInstance("MD5")
    // primitive sort + in-place dedup — a boxed TreeSet costs a node
    // allocation per gram and dominated this projection's profile
    val hashes = new Array[Long](cps.length - n + 1)
    var i = 0
    while (i <= cps.length - n) {
      hashes(i) = SimHash60.md5Top60(md, new String(cps, i, n)) % MinHashLsh.P
      i += 1
    }
    SortedDistinct.toArrayData(hashes, hashes.length)
  }
}
