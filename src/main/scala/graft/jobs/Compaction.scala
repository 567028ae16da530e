package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for a partitioned parquet tree — the
  * operational job every long-lived table needs (streaming sinks and
  * incremental appends accrete kilobyte files; at 100 TB the resulting
  * open/seek overhead dominates scan time long before bytes do).
  *
  * Per HIVE partition the job computes the current byte size, derives a
  * target file count `ceil(bytes / targetBytes)` (min 1), and rewrites
  * the partition with AT MOST that many files: rows are salted by
  * `pmod(hash(whole row), n)` and shuffled by (partition cols, salt) —
  * each shuffle task writes one file per partition value it holds, so a
  * partition lands in ≤ n files (~targetBytes each; hash collisions can
  * merge salt groups, never split them). Dynamic partition overwrite
  * replaces EXACTLY the rewritten partitions — a concurrent untouched
  * partition survives (the dynamic-partition backfill discipline).
  *
  * Scale shape: one metadata listing (driver-side, O(files) — the thing
  * being fixed; acceptable because it shrinks), one shuffle sized by the
  * data rewritten, no collect of row data. Content is preserved
  * verbatim; only layout changes (spec asserts exact round trip and the
  * post-compaction file counts). In-place rewrite is safe here because
  * dynamic overwrite stages output and swaps partitions at COMMIT, after
  * all source reads — but a mid-commit crash can lose the partition
  * being swapped, so a production run points the write at a staging
  * tree and renames (the TrainingArtifact versioning discipline).
  */
object Compaction {

  /** Returns (partitionValue → (bytes, files)) for a one-level
    * `col=value` partitioned tree. */
  def partitionStats(path: String): Map[String, (Long, Long)] = {
    val root = new java.io.File(path)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
    parts.map { d =>
      val files = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      d.getName -> ((files.map(_.length()).sum, files.length.toLong))
    }.toMap
  }

  /** Compacts every partition of `path` (one-level partitioning by
    * `partCol`) to files of ~`targetBytes`. */
  def compact(spark: SparkSession, path: String, partCol: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val stats = partitionStats(path)
    if (stats.isEmpty) return
    // target file count per partition value, broadcast as a literal map
    val counts = stats.map { case (dir, (bytes, _)) =>
      val value = dir.substring(dir.indexOf('=') + 1)
      value -> math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    }
    val df = spark.read.parquet(path)
    val nFiles = counts.foldLeft(when(lit(false), lit(1L))) {
      case (acc, (v, n)) => acc.when(col(partCol).cast("string") === v, lit(n))
    }.otherwise(lit(1L))
    val salted = df
      .withColumn("_n", nFiles)
      .withColumn("_salt", pmod(hash(struct(df.columns.map(col): _*)), col("_n")))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      salted
        .repartition(col(partCol), col("_salt"))
        .drop("_n", "_salt")
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partCol)
        .parquet(path)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** The read-back frame, for parity checks. */
  def readBack(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
