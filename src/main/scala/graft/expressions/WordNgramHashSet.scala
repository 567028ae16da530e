package graft.expressions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `word_ngram_hash_set(string, n) →
  * array<long>` — the distinct 60-bit md5 hashes of a text's word
  * n-grams (whitespace-tokenized, empty tokens dropped), sorted
  * ascending, in ONE pass per document.
  *
  * The word-granularity generalization of [[ShingleHashSetExpr]]
  * (which is fixed at n=2 and reduces mod P for minhash): the
  * decontamination join ([[graft.llm.Decontamination]]) matches at
  * n ≈ 8-13, where a HOF formulation pays a per-gram `slice` array
  * copy plus string md5/conv round-trip — measured 6.1 s of q50's
  * sf0.1 wall-time, ~4 s of it this projection. Hash = value of the
  * first 15 md5 hex digits (top 60 bits), NO mod: collisions at 60
  * bits are what the decontamination contract assumes negligible.
  * Texts with fewer than n tokens yield an empty array.
  *
  * SET-identical to the kept HOF cross-check
  * ([[graft.llm.Decontamination.ngramHashSetHof]], asserted in
  * LlmTextSpec); the DuckDB oracle mirrors the same md5-prefix
  * arithmetic over `list_slice` grams.
  */
case class WordNgramHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"word_ngram_hash_set needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hash_set requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordNgramHashSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashSetExpr =
    copy(child = newChild)
}

object WordNgramHashSet {
  private val Ws = Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    // same tokenizer as the HOF: split on \s+, drop empty tokens (a
    // leading separator yields one at index 0; split(-1) keeps trailing
    // empties, which the filter then drops)
    val raw = Ws.split(text.toString, -1)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    if (nTok < n) return new GenericArrayData(new Array[Any](0))
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nTok - n + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hashes(i) = SimHash60.md5Top60(md, sb.toString)
      i += 1
    }
    SortedDistinct.toArrayData(hashes, hashes.length)
  }
}
