package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `char_entropy(string) → struct(n_cp,
  * entropy)` — code-point count and Shannon entropy (natural log) of
  * the code-point distribution, one pass per document.
  *
  * The gibberish/binary-noise detector of the quality-filter family:
  * natural text sits in a narrow entropy band (~2.5–4.2 nats for
  * English), base64 blobs and key dumps far above it, repeated-char
  * padding far below. Complements `text_stats` (token level) and
  * `rep_stats` (span level) at the character level.
  *
  * Determinism contract: the entropy sum folds over code points in
  * ASCENDING code-point order, term = (c/n) * ln(c/n), accumulator
  * seeded 0.0, final value -sum + 0.0 (the +0.0 collapses IEEE -0.0 for
  * single-symbol texts) — the DuckDB oracle (q97) reproduces the exact
  * doubles with a `list_reduce(list(... ORDER BY cp))` fold.
  * Per-row projection, no shuffle; codegen'd via the static-call
  * pattern of [[RepStatsExpr]].
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = CharEntropy.schema
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropy {

  val schema: StructType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  /** One pass: count code points (sorted map keyed by code point so the
    * fold order is deterministic), then fold ascending. Empty text →
    * (0, 0.0). */
  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n.toDouble
      sum += p * math.log(p)
    }
    val entropy = if (n == 0L) 0.0 else -sum + 0.0
    new GenericInternalRow(Array[Any](n, entropy))
  }
}
