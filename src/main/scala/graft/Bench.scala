package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Measurement notes:
  *  - Each query is materialized through the built-in `noop` sink, which
  *    consumes every row AND every column — unlike `count()`, which lets
  *    Catalyst prune the whole projection away and under-measures scan +
  *    project cost (round-1 verdict finding).
  *  - Failures are NOT swallowed: a failing query records `-1` in the
  *    per-query map, is listed in `errors`, and flips the exit code to 1,
  *    so a regression can never look like a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup (no benchmark data touched — a throwaway
    // synthetic parquet under /tmp): without it the alphabetically-first
    // queries absorb seconds of JIT + first-use machinery cost (parquet
    // reader, hash-agg/join/window codegen, AQE) and distort per-query
    // numbers — q01 measured ~2.5 s of warmup on top of ~0.5 s of work.
    val warmDir = java.nio.file.Files.createTempDirectory("graft_warm").toString
    spark.range(200000).selectExpr("id", "id % 97 AS k", "rand(7) AS v")
      .write.mode("overwrite").parquet(warmDir)
    val warm = spark.read.parquet(warmDir)
    warm.filter("v > 0.1").groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
      .join(warm.select("k").distinct(), "k")
      .selectExpr("k", "s", "row_number() OVER (ORDER BY s) AS rn")
      .write.format("noop").mode("overwrite").save()
    // the warmup dataset is throwaway — don't accumulate it in /tmp
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // per-query isolation: queries that persist internal tables must
        // not leak cached state into later timings. Inside the try: an
        // exception here must record a query failure, not kill the run
        // (the r3 bench died at this line outside any handler).
        try {
          spark.catalog.clearCache()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors ::= name
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"method":"noop-sink full materialization (r1 used count(), which pruned projections)","sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
