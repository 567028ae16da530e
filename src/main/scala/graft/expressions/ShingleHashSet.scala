package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.MinHashLsh

/** Native Catalyst expression: `shingle_hash_set(string) → array<long>`
  * — the distinct mod-P 60-bit md5 hashes of a text's distinct word
  * bigrams, in ONE pass per document.
  *
  * This is the minhash pipeline's per-document hash set
  * ([[graft.llm.MinHashLsh.hashSets]]) computed as a pure projection.
  * The round-2 shape — explode(word_bigrams) → md5 hex → conv(16,10) →
  * groupBy(doc_id).collect_set — shuffled every (doc, shingle) row just
  * to reassemble rows that were already together; a document's hash set
  * depends only on its own text, so no exchange is needed at any scale.
  *
  * SET-IDENTICAL to the exploded path (asserted in LlmTextSpec): same
  * tokenizer as [[WordBigrams]], hash = value of the first 15 md5 hex
  * digits (= top 60 bits of the digest) mod [[MinHashLsh.P]], distinct.
  * The output is SORTED ASCENDING — [[SortedIntersectSizeExpr]] merge-
  * counts pair intersections against that invariant, and the other
  * consumers (array_min permutations, band keys) are order-insensitive;
  * collect_set gave nondeterministic order anyway.
  *
  * Documents with fewer than two tokens yield an EMPTY array (where the
  * exploded path dropped the document row entirely) — callers filter
  * `size(hs) > 0` to keep the row-set contract.
  */
case class ShingleHashSetExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleHashSet.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSetExpr =
    copy(child = newChild)
}

object ShingleHashSet {
  private val Ws = Pattern.compile("\\s+")

  def compute(text: UTF8String): ArrayData = {
    val toks = Ws.split(text.toString, -1)
    if (toks.length < 2) return new GenericArrayData(new Array[Any](0))
    // distinct bigrams first (dedup on the string, as word_bigrams does,
    // saving an md5 per repeated gram), then hash into a primitive array
    // sorted+deduped by SortedDistinct — the sorted_intersect_size invariant
    val bigrams = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length - 1) {
      bigrams.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](bigrams.size)
    val it = bigrams.iterator()
    var j = 0
    while (it.hasNext) {
      hashes(j) = SimHash60.md5Top60(md, it.next()) % MinHashLsh.P
      j += 1
    }
    SortedDistinct.toArrayData(hashes, j)
  }
}
