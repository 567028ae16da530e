package graft.tools

/** Scratch measurement for q141's cost split: times
  * [[graft.operators.Profiling.profile]] with and without the exact
  * per-column distinct arm (alternating passes so JIT warmth is
  * shared), backing the scale-mode doc's measured numbers.
  */
object ProfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables.lineitem(spark, dir)
    for (pass <- 1 to 3; mode <- Seq(true, false)) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.operators.Profiling.profile(t, exactDistinct = mode)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF pass=$pass exact=$mode%-5s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
