package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `bloom_hit(bloom: binary, h: bigint) → boolean` — membership probe
  * against a SERIALIZED Spark `BloomFilter` sketch (the public
  * spark-sketch format [[graft.sources.BloomFileIndex]] stores per
  * file). Spark's own `BloomFilterMightContain` exists but requires the
  * bloom side to be a CONSTANT (it serves runtime join filters); an
  * index TABLE holds one bloom per row, so the probe must evaluate
  * per-row on executors — which also keeps the index scan distributed
  * instead of collecting file-count × 120 KB of sketches to the driver.
  *
  * Per-row deserialization cost is fine at the index's scale: the
  * probed table is O(files), not O(rows), and a lookup touches it once.
  */
case class BloomHitExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_hit requires (binary, bigint), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_hit"

  override protected def nullSafeEval(b: Any, h: Any): Any =
    BloomHit.test(b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.expressions.BloomHit.test($b, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomHitExpr =
    copy(left = newLeft, right = newRight)
}

object BloomHit {
  def test(bytes: Array[Byte], h: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(h)
}
