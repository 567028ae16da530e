package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for delta+varint posting-list storage —
  * the byte format every production inverted index and doc-id stream
  * stores at scale (Lucene's vInt postings, Kafka/protobuf varints:
  * public formats, re-implemented here from the LEB128 definition).
  *
  * `varint_pack(array<bigint>) → binary`: the input must be
  * non-negative and non-decreasing (a sorted posting list — violations
  * are a caller bug and FAIL LOUDLY, never silently mis-encode). The
  * first element is LEB128-encoded as-is; every later element encodes
  * as the delta from its predecessor. Sorted doc-id gaps are small, so
  * most deltas fit one byte: ~5–8× smaller than the 8-bytes-per-id
  * raw layout, and the compression IMPROVES as posting lists densify
  * (denser list → smaller gaps), exactly when raw storage hurts most.
  *
  * `varint_unpack(binary) → array<bigint>` reverses it (prefix-sum of
  * decoded deltas). Truncated buffers, non-terminating varints, and
  * >10-byte groups fail loudly.
  *
  * Both are per-row projections inside whole-stage codegen — the
  * pack/unpack sites are the index write/read paths, so the codec must
  * never cost a shuffle.
  */
case class VarintPackExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"varint_pack requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "varint_pack"

  override protected def nullSafeEval(a: Any): Any =
    Varint.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Varint.pack($a);")

  override protected def withNewChildInternal(newChild: Expression): VarintPackExpr =
    copy(child = newChild)
}

case class VarintUnpackExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"varint_unpack requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "varint_unpack"

  override protected def nullSafeEval(b: Any): Any =
    Varint.unpack(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.Varint.unpack($b);")

  override protected def withNewChildInternal(newChild: Expression): VarintUnpackExpr =
    copy(child = newChild)
}

object Varint {
  /** LEB128 byte length of an unsigned value (1..10). */
  private def width(v: Long): Int = {
    var x = v
    var n = 1
    while ((x & ~0x7fL) != 0) { x >>>= 7; n += 1 }
    n
  }

  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyByteArray
    // size pass, validating monotonicity once
    var bytes = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (i == 0) {
        if (v < 0) throw new IllegalArgumentException(
          s"varint_pack: negative element $v")
        bytes += width(v)
      } else {
        if (v < prev) throw new IllegalArgumentException(
          s"varint_pack: input not sorted ascending ($prev then $v)")
        bytes += width(v - prev)
      }
      prev = v
      i += 1
    }
    val out = new Array[Byte](bytes)
    var o = 0
    prev = 0L
    i = 0
    while (i < n) {
      val v = arr.getLong(i)
      var x = if (i == 0) v else v - prev
      while ((x & ~0x7fL) != 0) {
        out(o) = ((x & 0x7f) | 0x80).toByte; o += 1; x >>>= 7
      }
      out(o) = x.toByte; o += 1
      prev = v
      i += 1
    }
    out
  }

  def unpack(b: Array[Byte]): ArrayData = {
    // count pass: one value per byte with the high bit clear
    var n = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) == 0) n += 1
      i += 1
    }
    if (b.length > 0 && (b(b.length - 1) & 0x80) != 0)
      throw new IllegalArgumentException(
        "varint_unpack: truncated buffer (unterminated varint)")
    val out = new Array[Long](n)
    var o = 0
    var acc = 0L
    i = 0
    while (i < b.length) {
      var x = 0L
      var shift = 0
      var more = true
      while (more) {
        val byte = b(i); i += 1
        if (shift >= 64) throw new IllegalArgumentException(
          "varint_unpack: varint group exceeds 64 bits")
        // 10th byte (shift 63): only its LSB fits in a 64-bit value —
        // payload bits 1..6 would shift out of range and silently
        // truncate, and a set continuation bit promises an 11th byte.
        // Both are non-canonical encodings: fail loudly, never decode a
        // wrong value.
        if (shift == 63 && (byte & 0xfe) != 0)
          throw new IllegalArgumentException(
            "varint_unpack: non-canonical 10-byte group (payload above bit 63)")
        x |= (byte & 0x7fL) << shift
        shift += 7
        more = (byte & 0x80) != 0
      }
      acc = if (o == 0) x else acc + x
      out(o) = acc
      o += 1
    }
    new GenericArrayData(out)
  }
}
