package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.Compaction
import graft.sources.Manifest

/** Measured full-vs-incremental OPTIMIZE evidence (round-13 verdict
  * #1's done-criterion): build a MANY-LEAF two-level tree where only
  * ONE leaf is fragmented — the daily-append shape where yesterday's
  * leaves are closed and compact and only today accretes small
  * files — and time `compactAtomicLeaves` on it (incremental: one
  * leaf staged) against the same operator on an ALL-FRAGMENTED twin
  * of the same total size (the work the pre-round-14 full rewrite did
  * on EITHER tree, since it re-staged every row of every leaf
  * unconditionally).
  *
  * Output: one JSON line with per-arm wall seconds, files rewritten,
  * and the ratio — SCALING.md records it. */
object ProbeOptIncr {

  private def build(spark: SparkSession, root: String, leaves: Int,
                    rowsPerLeaf: Int, fragmented: Set[Int]): Unit = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    (0 until leaves).foreach { l =>
      val df = (1 to rowsPerLeaf)
        .map(i => (l.toLong * rowsPerLeaf + i, f"w${l / 10}", f"m${l % 10}"))
        .toDF("id", "w", "m")
      val shaped = if (fragmented(l)) df.repartition(12) else df.coalesce(1)
      shaped.write.mode("append").partitionBy("w", "m").parquet(root)
    }
    Manifest.bootstrap(spark, root)
    Manifest.writeStats(spark, root, 1L) // byte budgets from the log
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    val leaves = sys.env.getOrElse("SPARK_GRAFT_OPT_LEAVES", "40").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_OPT_ROWS", "50000").toInt

    def timeArm(name: String, fragmented: Set[Int]): (Double, Long, Long) = {
      val root = s"$tmp/graft_optincr_$name/t"
      build(spark, root, leaves, rows, fragmented)
      val before = Manifest.current(spark, root).get._2.toSet
      val t0 = System.nanoTime()
      val v = Compaction.compactAtomicLeaves(spark, root, Seq("w", "m"),
        keepVersions = 0)
      val wall = (System.nanoTime() - t0) / 1e9
      val after = Manifest.filesAt(spark, root, v).toSet
      (wall, (before -- after).size.toLong, (after -- before).size.toLong)
    }

    // warm-up (JIT/codegen) on a throwaway small tree
    timeArm("warm", Set(0)): Unit
    val (incrWall, incrRepl, incrNew) = timeArm("incr", Set(leaves - 1))
    val (fullWall, fullRepl, fullNew) =
      timeArm("full", (0 until leaves).toSet)
    println(
      s"""{"metric":"optimize_incremental","leaves":$leaves,""" +
      s""""rows_per_leaf":$rows,""" +
      s""""incremental":{"wall_sec":${f"$incrWall%.3f"},""" +
      s""""files_replaced":$incrRepl,"files_created":$incrNew},""" +
      s""""full_equivalent":{"wall_sec":${f"$fullWall%.3f"},""" +
      s""""files_replaced":$fullRepl,"files_created":$fullNew},""" +
      s""""speedup":${f"${fullWall / incrWall}%.2f"}}""")
    spark.stop()
  }
}
