package graft

/** Robustness sweep: EVERY registered query must plan and execute
  * against empty input tables without throwing. At 100 TB the engine
  * constantly sees empty slices — an empty day partition, a language
  * with zero docs after filtering, a dedup batch with no candidates —
  * and an operator that crashes on zero rows takes the whole job with
  * it. Zero-row output is fine; an exception is a bug.
  *
  * The empty dir mirrors the real testdata layout with each table's
  * exact schema and no rows (limit 0 over sf0.001), so schema-dependent
  * code paths (from_json columns, embedding arrays, nanos timestamps)
  * all engage.
  */
class EmptyInputSpec extends SparkTestBase {

  test("every registered query survives empty tables") {
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$emptyDir/$t.parquet")
    }
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, emptyDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          failures += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
      SparkEntry.clearMemos()
      spark.catalog.clearCache()
    }
    assert(failures.isEmpty,
      "queries crashing on empty input:\n" +
        failures.map { case (n, m) => s"  $n -> ${m.take(300)}" }.mkString("\n"))
  }
}
