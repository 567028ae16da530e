package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.sources.Manifest

/** Footer-based colstats maintenance (round-11 verdict #4): stats for
  * never-seen files come from parquet footer metadata — zero Spark
  * jobs, zero record-level reads — and the sidecar replays the
  * scan-computed one byte-identically wherever footers can prove
  * exactness; everything they can't prove falls back to the scan,
  * never to a guess. */
class FooterStatsSpec extends SparkTestBase {

  private def sidecar(root: String, v: Long): String = {
    val p = new java.io.File(new java.io.File(root, Manifest.Dir),
      f"colstats-$v%020d")
    new String(java.nio.file.Files.readAllBytes(p.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private def dropSidecars(root: String): Unit = {
    val dir = new java.io.File(root, Manifest.Dir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("colstats-")).foreach(_.delete())
  }

  /** id bigint, k int, nm string, d date, v bigint-with-nulls. */
  private def mkTable(): String = {
    val root = Files.createTempDirectory("graft_fstats").toString + "/t"
    spark.range(1000)
      .select(col("id"),
        (col("id") % 7).cast("int").as("k"),
        concat(lit("name-"), lpad(col("id").cast("string"), 4, "0"))
          .as("nm"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          (col("id") % 90).cast("int")).as("d"),
        when(col("id") % 11 === 0, lit(null).cast("long"))
          .otherwise(col("id") * 3).as("v"))
      .repartition(3).write.parquet(root)
    Manifest.bootstrap(spark, root)
    root
  }

  /** Runs `body` and returns the number of Spark jobs it started. */
  private def countJobs(body: => Unit): Int = {
    @volatile var jobs = 0
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(800) } // listener bus is async
    finally spark.sparkContext.removeSparkListener(l)
    jobs
  }

  test("footer mode: byte-identical sidecar with ZERO Spark jobs on " +
    "string + date columns") {
    val root = mkTable()
    val cols = Seq("nm", "d")
    Manifest.writeColStats(spark, root, 1L, cols)
    val scanBytes = sidecar(root, 1L)
    dropSidecars(root)
    val jobs = countJobs {
      Manifest.writeColStats(spark, root, 1L, cols, fromFooters = true)
    }
    assert(jobs == 0, s"footer stats ran $jobs Spark job(s)")
    assert(sidecar(root, 1L) == scanBytes,
      "footer sidecar must replay the scan-computed one byte-identically")
  }

  test("footer mode on integral/nullable columns: min/max/nulls/rows " +
    "replay the scan; the per-file sum records unknown, never a guess") {
    val root = mkTable()
    val cols = Seq("id", "k", "v")
    Manifest.writeColStats(spark, root, 1L, cols)
    def parse(text: String) = text.split("\n").filter(_.nonEmpty).map { ln =>
      val a = ln.split("\t", -1); (a(0), a(1)) -> a
    }.toMap
    val scan = parse(sidecar(root, 1L))
    dropSidecars(root)
    val jobs = countJobs {
      Manifest.writeColStats(spark, root, 1L, cols, fromFooters = true)
    }
    assert(jobs == 0)
    val footer = parse(sidecar(root, 1L))
    assert(footer.keySet == scan.keySet)
    footer.foreach { case (k, fa) =>
      val sa = scan(k)
      assert(fa.take(7).sameElements(sa.take(7)),
        s"$k: footer ${fa.toSeq} vs scan ${sa.toSeq}")
      // integral sums: the scan computed an exact value, the footer
      // has no source for one — unknown, not wrong
      assert(fa(7) == "?" && sa(7) != "?", s"$k sum fields: ${fa(7)}/${sa(7)}")
    }
    // the unknown sum must make log-side sum folding decline, not lie
    val cs = Manifest.readColStats(spark, root, 1L)
    assert(cs.forall(_._2._6.isEmpty), "footer sums must read as None")
  }

  test("TIMESTAMP_MICROS replays from the footer; INT96 falls back to " +
    "the scan and the sidecar content still matches") {
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    def mk(tsType: String): String = {
      spark.conf.set("spark.sql.parquet.outputTimestampType", tsType)
      val root = Files.createTempDirectory("graft_fts").toString + "/t"
      spark.range(500)
        .select(col("id"),
          (timestamp_seconds(lit(1577836800L) + col("id") * 37)).as("ts"))
        .repartition(2).write.parquet(root)
      Manifest.bootstrap(spark, root)
      root
    }
    try {
      val micros = mk("TIMESTAMP_MICROS")
      Manifest.writeColStats(spark, micros, 1L, Seq("ts"))
      val scanBytes = sidecar(micros, 1L)
      dropSidecars(micros)
      val jobs = countJobs {
        Manifest.writeColStats(spark, micros, 1L, Seq("ts"),
          fromFooters = true)
      }
      assert(jobs == 0, "MICROS timestamps must be footer-provable")
      assert(sidecar(micros, 1L) == scanBytes)

      val int96 = mk("INT96")
      Manifest.writeColStats(spark, int96, 1L, Seq("ts"))
      val scan96 = sidecar(int96, 1L)
      dropSidecars(int96)
      // INT96 stats are deprecated/unordered: footer mode must fall
      // back to the scan (jobs run) and still produce the exact sidecar
      val jobs96 = countJobs {
        Manifest.writeColStats(spark, int96, 1L, Seq("ts"),
          fromFooters = true)
      }
      assert(jobs96 > 0, "INT96 must take the scan fallback")
      assert(sidecar(int96, 1L) == scan96)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.parquet.outputTimestampType", p)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }

  test("partition columns are not footer-provable: fallback to the " +
    "scan, content identical; carry-forward keeps maintenance at " +
    "O(new file footers)") {
    val root = Files.createTempDirectory("graft_fpart").toString + "/t"
    spark.range(600)
      .select(col("id"), (col("id") % 3).cast("string").as("p"))
      .repartition(2).write.partitionBy("p").parquet(root)
    Manifest.bootstrap(spark, root)
    Manifest.writeColStats(spark, root, 1L, Seq("id", "p"))
    val scanBytes = sidecar(root, 1L)
    dropSidecars(root)
    val jobs = countJobs {
      Manifest.writeColStats(spark, root, 1L, Seq("id", "p"),
        fromFooters = true)
    }
    assert(jobs > 0, "a partition column forces the scan fallback")
    assert(sidecar(root, 1L) == scanBytes)

    // carry-forward: v2 adds files; footer mode stats ONLY those (id
    // alone now — footer-provable) with zero jobs, and min/max/nulls/
    // rows replay a from-scratch scan exactly (sums: the footer has no
    // source, so new files record unknown)
    spark.range(600, 900)
      .select(col("id"), (col("id") % 3).cast("string").as("p"))
      .repartition(1).write.mode("append").partitionBy("p").parquet(root)
    val (fs, rootP) = (new org.apache.hadoop.fs.Path(root))
      .getFileSystem(spark.sessionState.newHadoopConf()) ->
      new org.apache.hadoop.fs.Path(root)
    val v2 = Manifest.commit(spark, root,
      Manifest.listDataFiles(fs, rootP))
    dropSidecars(root)
    Manifest.writeColStats(spark, root, v2, Seq("id"))
    def parse(text: String) = text.split("\n").filter(_.nonEmpty).map { ln =>
      val a = ln.split("\t", -1); (a(0), a(1)) -> a
    }.toMap
    val scanV2 = parse(sidecar(root, v2))
    dropSidecars(root)
    val jobs2 = countJobs {
      Manifest.writeColStats(spark, root, v2, Seq("id"), fromFooters = true)
    }
    assert(jobs2 == 0)
    val footerV2 = parse(sidecar(root, v2))
    assert(footerV2.keySet == scanV2.keySet)
    footerV2.foreach { case (k, fa) =>
      assert(fa.take(7).sameElements(scanV2(k).take(7)),
        s"$k: ${fa.toSeq} vs ${scanV2(k).toSeq}")
    }
  }
}
