package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Shared tail of the per-document hash-set expressions: sort the first
  * `len` primitive hashes, dedup in place, box once into ArrayData. The
  * boxed-TreeSet formulation this replaces paid a node allocation per
  * gram — the dominant cost of the sketch projections at sf0.1. */
object SortedDistinct {
  def toArrayData(hashes: Array[Long], len: Int): ArrayData = {
    if (len == 0) return new GenericArrayData(new Array[Any](0))
    java.util.Arrays.sort(hashes, 0, len)
    var distinct = 1
    var i = 1
    while (i < len) {
      if (hashes(i) != hashes(i - 1)) {
        hashes(distinct) = hashes(i)
        distinct += 1
      }
      i += 1
    }
    val out = new Array[Any](distinct)
    i = 0
    while (i < distinct) { out(i) = hashes(i); i += 1 }
    new GenericArrayData(out)
  }
}
