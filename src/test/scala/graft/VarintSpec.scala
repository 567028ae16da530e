package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.expressions.Varint

class VarintSpec extends SparkTestBase {
  import spark.implicits._

  private def roundtrip(xs: Seq[Long]): Seq[Long] = {
    val packed = Varint.pack(new GenericArrayData(xs.toArray))
    val out = Varint.unpack(packed)
    (0 until out.numElements()).map(out.getLong)
  }

  private def packedLen(xs: Seq[Long]): Int =
    Varint.pack(new GenericArrayData(xs.toArray)).length

  test("roundtrip across widths, boundaries, and degenerate lists") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(0L, 0L, 0L),                      // delta 0 (duplicate ids)
      Seq(127L),
      Seq(128L),
      Seq(5L, 132L),                        // second delta exactly 127
      Seq(5L, 133L),                        // second delta exactly 128
      Seq(16383L, 16384L, 2097151L, 2097152L),
      (0L until 1000L by 7).toSeq,
      Seq(Long.MaxValue),
      Seq(0L, Long.MaxValue))
    cases.foreach(c => assert(roundtrip(c) == c, s"case $c"))
  }

  test("byte widths match the LEB128 definition") {
    assert(packedLen(Seq(0L)) == 1)
    assert(packedLen(Seq(127L)) == 1)
    assert(packedLen(Seq(128L)) == 2)
    assert(packedLen(Seq(16383L)) == 2)
    assert(packedLen(Seq(16384L)) == 3)
    assert(packedLen(Seq(Long.MaxValue)) == 9)
    // dense ascending ids: every delta 1 byte after a 1-byte head
    assert(packedLen((100L until 200L).toSeq) == 100)
  }

  test("violations fail loudly") {
    intercept[IllegalArgumentException](roundtrip(Seq(-1L)))
    intercept[IllegalArgumentException](roundtrip(Seq(5L, 4L)))
    // truncated: a continuation byte with nothing after it
    intercept[IllegalArgumentException](Varint.unpack(Array(0x85.toByte)))
    // non-canonical 10-byte group: payload bits above bit 63 (10th byte
    // 0x02) must throw, not silently truncate to a wrong value
    val tenByte = Array.fill(9)(0x80.toByte) :+ 0x02.toByte
    intercept[IllegalArgumentException](Varint.unpack(tenByte))
    // ... and a set continuation bit on the 10th byte promises an
    // impossible 11th group
    val contTail = Array.fill(9)(0x80.toByte) ++ Array(0x81.toByte, 0x00.toByte)
    intercept[IllegalArgumentException](Varint.unpack(contTail))
    // the canonical 10-byte encoding of Long.MinValue-as-unsigned-ish
    // shapes (LSB only in the 10th byte) still decodes: 9 full groups +
    // 0x01 = bit 63 set
    val canonical = Array.fill(9)(0xff.toByte) :+ 0x01.toByte
    assert(Varint.unpack(canonical).getLong(0) == -1L) // all 64 bits set
  }

  test("plan-level roundtrip + compression on fixture posting lists") {
    val lists = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(sort_array(collect_set(col("doc_id").cast("long"))).as("postings"))
    val packed = call_function("varint_pack", col("postings"))
    val checked = lists.select(
        (call_function("varint_unpack", packed) === col("postings")).as("ok"),
        size(col("postings")).as("n"),
        length(packed).as("pb"))
      .as[(Boolean, Int, Int)].collect()
    assert(checked.nonEmpty && checked.forall(_._1), "roundtrip in-plan")
    val (raw, pk) = (checked.map(_._2.toLong * 8).sum, checked.map(_._3.toLong).sum)
    assert(pk * 4 < raw, s"expected >4x compression on dense ids: $raw raw vs $pk packed")
  }
}
