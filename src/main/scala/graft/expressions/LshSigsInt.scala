package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

import graft.llm.Similarity

/** Native Catalyst expression: `lsh_sigs_int(array<float|double>,
  * nTables, nBits) → array<long>` — one INTEGER random-hyperplane
  * bucket signature per hash table (bit j set iff dot(emb,
  * plane(t, j)) > 0), in ONE pass over the embedding.
  *
  * The integer form exists for MULTI-PROBE: probing the Hamming-≤R
  * neighborhood of a query's bucket is `sig XOR mask` over a small
  * literal mask list — plain int64 ops on both the Spark side and the
  * DuckDB oracle, where the string signatures of [[LshSigsExpr]] would
  * need per-bit string surgery. Same deterministic hyperplanes
  * ([[Similarity.planeWeight]] — pure md5 of (t, j, dim)), same
  * left-to-right double accumulation. A vector whose length differs
  * from [[Similarity.Dims]] gets all-zero signatures (the
  * [[LshSigsExpr]] contract).
  *
  * The table/bit counts are constructor constants (validated ≤ 63 bits
  * so the signature stays a non-negative long): the plane matrix is
  * resolved once per (nTables, nBits) per JVM, not per row.
  */
case class LshSigsIntExpr(child: Expression, nTables: Int, nBits: Int)
    extends UnaryExpression {

  require(nTables >= 1 && nBits >= 1 && nBits <= 63,
    s"lsh_sigs_int needs 1..n tables and 1..63 bits, got $nTables x $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs_int requires array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sigs_int"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    LshSigsInt.compute(input.asInstanceOf[ArrayData], isFloat, nTables, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.LshSigsInt.compute($c, $isFloat, $nTables, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): LshSigsIntExpr =
    copy(child = newChild)
}

object LshSigsInt {
  import Similarity.Dims

  /** planes(t*nBits + j) for a given (nTables, nBits) — cached per
    * config per JVM (a handful of configs exist; the map never grows
    * unboundedly). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(nTables: Int, nBits: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nTables, nBits), { case (nt, nb) =>
      (for (t <- 0 until nt; j <- 0 until nb)
        yield (0 until Dims).map(d => Similarity.planeWeight(t, j, d)).toArray).toArray
    })

  def compute(emb: ArrayData, isFloat: Boolean, nTables: Int, nBits: Int): ArrayData = {
    val out = new Array[Any](nTables)
    if (emb.numElements() != Dims) {
      var t = 0
      while (t < nTables) { out(t) = 0L; t += 1 }
      return new GenericArrayData(out)
    }
    val e = new Array[Double](Dims)
    var d = 0
    while (d < Dims) {
      e(d) = if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)
      d += 1
    }
    val ps = planes(nTables, nBits)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var j = 0
      while (j < nBits) {
        val w = ps(t * nBits + j)
        var dot = 0.0
        var i = 0
        while (i < Dims) { dot += e(i) * w(i); i += 1 }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
