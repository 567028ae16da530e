package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.Manifest

/** Merge-on-read vs copy-on-write erasure, MEASURED: the deletion
  * vectors' 100 TB claim is a COST-MODEL claim — a DV delete writes
  * O(deleted rows) bytes while a partition-scoped rewrite writes
  * O(touched partitions) — so it gets the SCALING.md treatment:
  * run both erasure shapes on the same orders layout at two scale
  * factors and report wall seconds AND bytes physically written.
  *
  * Shapes compared on identical inputs (orders → (orderkey, custkey,
  * price_cents, w) partitioned by the 5-value priority wave; subjects
  * = custkey ≡ 0 mod 89, which touches EVERY partition — the
  * GDPR-batch worst case for copy-on-write, since a subject set with
  * no partition locality forces every partition to rewrite):
  *  - cow: [[graft.operators.Erasure.erasePartitionScopedAtomic]] —
  *    stage surviving rows of touched partitions + one commit.
  *  - dv: [[Manifest.deleteMatching]] — (file, pos) artifact + one
  *    commit, zero data files rewritten.
  *  - dv_purge: the deferred materialization ([[Manifest.purgeDeletes]]),
  *    the cost a DV deployment pays LATER, amortized across deletes.
  *
  * Output: one JSON line per (sf, shape): seconds, bytes written,
  * rows erased — the growth curve across the 10× decade is the
  * evidence. */
object DvProbe {

  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sessionState.newHadoopConf()
    val tmp = System.getProperty("java.io.tmpdir")

    def treeBytes(root: String): Long = {
      val p = new Path(root)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return 0L
      fs.getContentSummary(p).getLength
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (sf <- sfs) {
      val tag = sf.split("/").last
      val facts = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          substring(col("o_orderpriority"), 1, 1).as("w"))
      val subjects = facts.select("custkey")
        .where(pmod(col("custkey"), lit(89)) === 0).distinct()

      def freshLayout(name: String): String = {
        val root = new java.io.File(tmp, s"graft_dvprobe_${name}_$tag").toString
        val p = new Path(root)
        p.getFileSystem(conf).delete(p, true)
        facts.repartition(8).write.partitionBy("w").parquet(root)
        Manifest.bootstrap(spark, root)
        root
      }

      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }

      // copy-on-write: partition-scoped atomic erasure
      locally {
        val root = freshLayout("cow")
        val before = treeBytes(root)
        val (_, sec) = timed {
          graft.operators.Erasure.erasePartitionScopedAtomic(
            spark, root, "w", subjects, Seq("custkey"),
            batchId = s"probe-$tag", keepVersions = 2)
        }
        out += s"""{"sf":"$tag","shape":"cow","sec":${f2(sec)},"bytes_written":${treeBytes(root) - before}}"""
        System.err.println(out.last)
      }
      // merge-on-read: deletion-vector commit
      locally {
        val root = freshLayout("dv")
        val before = treeBytes(root)
        val ((_, n), sec) = timed {
          Manifest.deleteMatching(spark, root, subjects, Seq("custkey"))
        }
        val dvBytes = treeBytes(root) - before
        out += s"""{"sf":"$tag","shape":"dv","sec":${f2(sec)},"bytes_written":$dvBytes,"rows_erased":$n}"""
        System.err.println(out.last)
        // the deferred bill: purge materializes the DVs
        val beforeP = treeBytes(root)
        val (_, secP) = timed { Manifest.purgeDeletes(spark, root) }
        out += s"""{"sf":"$tag","shape":"dv_purge","sec":${f2(secP)},"bytes_written":${treeBytes(root) - beforeP}}"""
        System.err.println(out.last)
      }
    }
    println("[dvprobe] " + out.mkString("[", ",", "]"))
    spark.stop()
  }

  private def f2(d: Double): String = f"$d%.2f"
}
