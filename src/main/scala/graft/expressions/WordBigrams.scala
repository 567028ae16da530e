package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `word_bigrams(string) → array<string>` —
  * the distinct word-bigram shingles of a whitespace-tokenized text in
  * one pass.
  *
  * Replaces the HOF composition in [[graft.llm.MinHashLsh.shingles]]
  * (split → 2 slices → arrays_zip → transform(concat) → array_distinct):
  * higher-order functions are CodegenFallback and that chain allocates
  * four intermediate arrays per document; this tokenizes once and builds
  * the distinct bigram list with a hash set, inside whole-stage codegen
  * (static-call pattern of [[MinHashBandKeysExpr]]).
  *
  * BIT-IDENTICAL to the HOF path (asserted in LlmTextSpec): the
  * tokenizer is Java `Pattern.split(text, -1)` on `\s+` — exactly
  * Spark's `split(text, '\\s+')` semantics including the leading empty
  * token on leading whitespace — and distinctness keeps first
  * occurrences in order, as array_distinct does.
  */
case class WordBigramsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_bigrams requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"

  override protected def nullSafeEval(input: Any): Any =
    WordBigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordBigrams.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
    copy(child = newChild)
}

object WordBigrams {
  private val Ws = Pattern.compile("\\s+")

  /** One pass: tokenize, emit first-occurrence-ordered distinct bigrams.
    * Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val toks = Ws.split(text.toString, -1)
    if (toks.length < 2) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length - 1) {
      seen.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
