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
    val before = Compaction.partitionStats(spark, path)
    assert(before.nonEmpty && before.values.forall(_._2 >= 10),
      s"fixture not fragmented: $before")
    val expected = docs.collect().toSet

    // 64 KiB target → a handful of files per partition
    Compaction.compact(spark, path, "lang", targetBytes = 64L * 1024)

    val after = Compaction.partitionStats(spark, path)
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

  test("a scoped run rewrites only the named partition; others stay byte-identical") {
    val path = Files.createTempDirectory("compact2").toString + "/t"
    val a = Seq((1L, "x", "en"), (2L, "y", "en")).toDF("id", "v", "lang")
    val b = Seq((3L, "z", "de")).toDF("id", "v", "lang")
    a.unionByName(b).repartition(5).write.partitionBy("lang").parquet(path)
    def files(dir: String): Set[(String, Long)] =
      Option(new java.io.File(path, dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length()).toSet
    val deBefore = files("lang=de")
    assert(deBefore.nonEmpty)

    Compaction.compact(spark, path, "lang", targetBytes = 1L << 30,
      partitions = Some(Set("en")))

    // en compacted to one file; de's file names AND sizes are untouched
    assert(Compaction.partitionStats(spark, path)("en")._2 == 1L)
    assert(files("lang=de") == deBefore, "dynamic overwrite touched de")
    val back = Compaction.readBack(spark, path)
      .select("id", "v", "lang").as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "x", "en"), (2L, "y", "en"), (3L, "z", "de")))
  }

  test("unknown partition names fail loudly instead of compacting nothing") {
    val path = Files.createTempDirectory("compact3").toString + "/t"
    Seq((1L, "en")).toDF("id", "lang").write.partitionBy("lang").parquet(path)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, path, "lang", partitions = Some(Set("xx")))
    }
    assert(e.getMessage.contains("xx"))
  }

  test("typed-looking partition values round-trip as directory strings") {
    // hour=00..02: inference would read these as INT 0..2 and the
    // rewrite would emit a SECOND hour=0.. directory family next to the
    // originals — every row then read twice. The inference-off rewrite
    // must keep the zero-padded names.
    val path = Files.createTempDirectory("compact4").toString + "/t"
    Seq((1L, "00"), (2L, "00"), (3L, "01"), (4L, "02"))
      .toDF("id", "hour").repartition(4)
      .write.partitionBy("hour").parquet(path)
    Compaction.compact(spark, path, "hour", targetBytes = 1L << 30)
    val dirs = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("hour=00", "hour=01", "hour=02"),
      s"directory families changed: $dirs")
    val back = spark.read.parquet(path).select("id").as[Long].collect().toSet
    assert(back == Set(1L, 2L, 3L, 4L), "rows duplicated or lost")
  }
}
