package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Manifest

/** Microtime the q250 lifecycle pieces: deleteMatching, 160 bare
  * commits under auto-checkpointing, and the two gate counts. */
object ProbeCommit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = GraftSession.builder(master = "local[32]",
      shufflePartitions = Some(32)).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"=== pass $pass")
      val root = java.nio.file.Files.createTempDirectory("ckprobe").toString
      val facts = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          substring(col("o_orderpriority"), 1, 1).as("w"))
      t("seed") {
        facts.write.mode("overwrite").partitionBy("w").parquet(root)
        Manifest.bootstrap(s, root)
      }
      s.conf.set("spark.graft.manifest.checkpointInterval", "40")
      s.conf.set("spark.graft.manifest.logRetention", "50")
      t("deleteMatching") {
        val subjects = facts.select("custkey")
          .where(pmod(col("custkey"), lit(151)) === 0).distinct()
        Manifest.deleteMatching(s, root, subjects, Seq("custkey"))
      }
      val live = Manifest.current(s, root).get._2
      t("160 commits") {
        for (_ <- 1 to 160) Manifest.commit(s, root, live)
      }
      t("gate counts") {
        Manifest.readVersion(s, root, 160L).count()
        Manifest.read(s, root).count()
      }
      t("final agg") {
        Manifest.read(s, root).groupBy("w")
          .agg(count(lit(1)), sum("price_cents"))
          .write.format("noop").mode("overwrite").save()
      }
      s.conf.unset("spark.graft.manifest.checkpointInterval")
      s.conf.unset("spark.graft.manifest.logRetention")
    }
    s.stop()
  }
}
