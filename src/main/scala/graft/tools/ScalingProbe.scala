package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-evidence probe: run a representative query subset at every
  * available scale factor (sf0.001 → sf0.1 is a 100× row-count range)
  * and report per-sf medians, so the "would this survive a scale-up"
  * judgment rests on MEASURED growth curves instead of plan reading.
  * A query whose time grows ~linearly (or sub-linearly, while the
  * fixed session/JIT overhead amortizes) across 100× of input is
  * plan-shape evidence no explain() can fake; one that grows
  * super-linearly is flagged by the ratio column.
  *
  * Output: one JSON line {"queries": {name: {sf: sec}}, "ratios":
  * {name: t(0.1)/t(0.01)}} — the interesting ratio is the top decade
  * (10× rows), where fixed overheads no longer dominate.
  */
object ScalingProbe {

  // shapes: scan-agg, full GA pipeline, banded dedup, ANN, lexical
  // ranking, packing chain, iterative graph, asymmetric containment,
  // windowed SCD2, wide-profile
  val Subset = Seq("q01_pricing_agg", "q16_ga_sessions", "q20_dedup_minhash",
    "q26_ann_brute", "q55_bm25", "q65_sequence_packing", "q100_pagerank",
    "q101_containment_join", "q104_scd2_intervals", "q141_data_profile",
    // round 11: the df-capped containment twin — the measured proof
    // that the maxDf lever turns q101's super-linear top decade linear
    "q228_containment_capped")

  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALING_PASSES", "3").toInt
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up on the smallest sf so the first measured sf
    // doesn't absorb session start-up (the Bench discipline)
    Subset.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfs.head)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      spark.catalog.clearCache()
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, Double]]
    for (sf <- sfs; n <- Subset) {
      val ts = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        graft.SparkEntry.clearMemos()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val tag = sf.split("/").last
      results.getOrElseUpdate(n,
        scala.collection.mutable.LinkedHashMap.empty) += tag -> median(ts)
      System.err.println(f"[scaling] $n $tag ${median(ts)}%.2f s")
    }
    def d2(t: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    val qJson = results.map { case (n, m) =>
      "\"" + n + "\":{" + m.map { case (sf, t) => "\"" + sf + "\":" + d2(t) }
        .mkString(",") + "}"
    }.mkString("{", ",", "}")
    val ratios = results.collect {
      case (n, m) if m.contains("sf0.1") && m.contains("sf0.01") =>
        "\"" + n + "\":" + d2(m("sf0.1") / m("sf0.01"))
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scaling","passes":$passes,"queries":$qJson,"ratio_top_decade":$ratios}""")
    spark.stop()
  }
}
