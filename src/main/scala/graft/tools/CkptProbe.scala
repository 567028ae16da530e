package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.Manifest

/** Measured evidence for the commit-log checkpointing claim
  * (SCALING.md): drive N commits with compaction OFF vs ON and time
  * what a READER pays afterwards — `versions()` (every analysis lists
  * the log), `read().count()` (snapshot resolution + scan), and
  * `writeStats` (the sidecar carry-forward that unions every retained
  * sidecar). Usage:
  *   runMain graft.tools.CkptProbe [nCommits] [interval]
  * Prints one line per arm:
  *   CKPT_PROBE {"arm":…,"n_commits":…,"log_entries":…,
  *               "versions_ms":…,"read_ms":…,"stats_ms":…}
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000
    val interval = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def arm(name: String, conf: String): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"ckpt_probe_$name").toString + "/t"
      spark.range(1000).selectExpr("id", "id % 5 AS day")
        .write.partitionBy("day").parquet(root)
      spark.conf.set("spark.graft.manifest.checkpointInterval", conf)
      try {
        Manifest.bootstrap(spark, root)
        Manifest.writeStats(spark, root, 1L)
        val live = Manifest.current(spark, root).get._2
        val t0 = System.nanoTime()
        for (_ <- 1 to n) Manifest.commit(spark, root, live)
        val commitMs = (System.nanoTime() - t0) / 1000000L
        val dir = new java.io.File(root, Manifest.Dir)
        val entries = Option(dir.listFiles()).map(_.length).getOrElse(0)
        val t1 = System.nanoTime()
        val nv = Manifest.versions(spark, root).size
        val versionsMs = (System.nanoTime() - t1) / 1000000L
        val t2 = System.nanoTime()
        val cnt = Manifest.read(spark, root).count()
        val readMs = (System.nanoTime() - t2) / 1000000L
        val t3 = System.nanoTime()
        Manifest.writeStats(spark, root,
          Manifest.current(spark, root).get._1)
        val statsMs = (System.nanoTime() - t3) / 1000000L
        println(s"""CKPT_PROBE {"arm":"$name","n_commits":$n,""" +
          s""""interval":"$conf","log_entries":$entries,""" +
          s""""retained_versions":$nv,"rows":$cnt,""" +
          s""""commit_total_ms":$commitMs,"versions_ms":$versionsMs,""" +
          s""""read_ms":$readMs,"stats_ms":$statsMs}""")
      } finally
        spark.conf.unset("spark.graft.manifest.checkpointInterval")
    }
    arm("uncompacted", "0")
    arm("checkpointed", interval.toString)
    spark.stop()
  }
}
