package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev helper: write `.explain("formatted")` of registered queries to
  * files — the round-14 optimization deliverable
  * (`plans/r14/<query>_{before,after}.txt`).
  *
  * `runMain graft.tools.PlanDump <name>[,<name>...] <outDir> <suffix> [sfDir]`
  * writes `<outDir>/<name>_<suffix>.txt` per query. Uses the bench's
  * session shape (local[32], shuffle.partitions=32, extensions on) so
  * the dumped plan is the one the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      SparkEntry.clearMemos()
      spark.catalog.clearCache()
      SparkEntry.setup.get(q).foreach(_(spark, dir))
      val df = SparkEntry.queries(q)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${q}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
