package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.Compaction

/** Small-file compaction: content-preserving, bounded file counts,
  * untouched partitions survive the dynamic overwrite. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction shrinks a fragmented tree, preserves content exactly") {
    val path = Files.createTempDirectory("compact").toString + "/t"
    val docs = graft.sources.Tables.documents(spark, sf)
    // fragment: ~20 files per lang partition
    docs.repartition(20).write.partitionBy("lang").parquet(path)
    val before = Compaction.partitionStats(path)
    assert(before.nonEmpty && before.values.forall(_._2 >= 10),
      s"fixture not fragmented: $before")
    val expected = docs.collect().toSet

    // 64 KiB target → a handful of files per partition
    Compaction.compact(spark, path, "lang", targetBytes = 64L * 1024)

    val after = Compaction.partitionStats(path)
    assert(after.keySet == before.keySet, "partition set changed")
    after.foreach { case (p, (bytes, files)) =>
      val target = math.max(1L, (before(p)._1 + 64 * 1024 - 1) / (64 * 1024))
      assert(files <= math.max(target, 1L) && files >= 1,
        s"$p: $files files for ${bytes}B (target $target)")
      assert(files < before(p)._2, s"$p did not shrink: $files")
    }
    // content round trip: exact same rows, column order restored by select
    val back = Compaction.readBack(spark, path)
      .select(docs.columns.map(col): _*).collect().toSet
    assert(back == expected)
  }

  test("partitions outside the tree being rewritten are untouched") {
    val path = Files.createTempDirectory("compact2").toString + "/t"
    val a = Seq((1L, "x", "en"), (2L, "y", "en")).toDF("id", "v", "lang")
    val b = Seq((3L, "z", "de")).toDF("id", "v", "lang")
    a.unionByName(b).repartition(5).write.partitionBy("lang").parquet(path)
    val deBefore = Compaction.partitionStats(path)("lang=de")
    // compact with a huge target: every partition becomes 1 file — but
    // the de partition's CONTENT must be byte-for-byte re-readable
    Compaction.compact(spark, path, "lang", targetBytes = 1L << 30)
    val stats = Compaction.partitionStats(path)
    assert(stats.values.forall(_._2 == 1L), s"not fully compacted: $stats")
    val back = Compaction.readBack(spark, path)
      .select("id", "v", "lang").as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "x", "en"), (2L, "y", "en"), (3L, "z", "de")))
    assert(deBefore._1 > 0)
  }
}
