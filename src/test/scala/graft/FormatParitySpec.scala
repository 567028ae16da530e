package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-format parity — the S-family beyond parquet/JSONL: a user
  * bringing ORC or CSV data must read back exactly what the engine
  * wrote. Spec-gated like the sinks (S3–S5): format round trips can't
  * be DuckDB-oracled, but equality against the parquet-sourced frame is
  * the same contract.
  */
class FormatParitySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private lazy val docs = graft.sources.Tables.documents(spark, sf)

  test("ORC round trip is exact, including multi-line text") {
    val path = tmp("orc")
    docs.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("ORC scan gets predicate pushdown and column pruning") {
    val path = tmp("orcp")
    docs.write.orc(path)
    val q = spark.read.orc(path).filter(col("lang") === "en").select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"),
      s"filter did not reach the ORC scan:\n$plan")
    // ReadSchema must not drag the text column through the scan
    assert(!plan.contains("text"), s"column pruning lost:\n$plan")
  }

  test("ORC preserves event timestamps to the microsecond") {
    val path = tmp("orct")
    val ev = graft.sources.Tables.events(spark, sf).limit(1000)
    ev.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("CSV round trip with declared schema survives quotes and newlines") {
    val path = tmp("csv")
    // multiLine text with embedded quotes/newlines is exactly what
    // breaks naive CSV handling — escape/quote options make it lossless
    docs.write.option("header", "true").option("escape", "\"").csv(path)
    val back = spark.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(path)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("CSV PERMISSIVE mode quarantines corrupt rows instead of failing the job") {
    val dir = Files.createTempDirectory("csvbad").toString
    val f = new java.io.File(dir, "part.csv")
    val w = new java.io.PrintWriter(f)
    w.println("doc_id,n_chars")
    w.println("1,10")
    w.println("oops,not_a_number")
    w.println("3,30")
    w.close()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, n_chars LONG, _corrupt_record STRING")
    val read = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires the same scan to see both
    val good = read.filter(col("_corrupt_record").isNull)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toSet
    val bad = read.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(good == Set((1L, 10L), (3L, 30L)))
    assert(bad.toSeq == Seq("oops,not_a_number"))
    read.unpersist()
  }
}
