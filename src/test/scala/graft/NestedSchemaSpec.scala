package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ingest.Ingest
import graft.jobs.GaPipeline
import graft.schema.NestedSchema

class NestedSchemaSpec extends SparkTestBase {

  private lazy val hits =
    Ingest.readEnrichedHits(spark, "fixtures/ga/enriched/year=2019/month=09/day=23")
  private lazy val out = GaPipeline.run(
    hits, GaPipeline.loadHistory(spark, "/nonexistent/history"), "2019-09-23",
    persistExport = false)

  test("toNested folds the export's flat columns into BigQuery-style structs") {
    val nested = NestedSchema.toNested(
      GaPipeline.exportTable(
        graft.operators.Ecommerce.explodeProducts(
          GaPipeline.withDerivedColumns(GaPipeline.sessionized(hits)))
          .withColumn("product_revenue", lit(null).cast("double"))))
    val s = nested.schema
    def struct(name: String) = s(name).dataType.asInstanceOf[StructType]
    assert(struct("trafficSource").fieldNames.contains("source"))
    assert(struct("geoNetwork").fieldNames.contains("country"))
    assert(struct("device").fieldNames.contains("browser"))
    val h = struct("hits")
    assert(h.fieldNames.toSet.contains("page"))
    assert(h("page").dataType.asInstanceOf[StructType]
      .fieldNames.contains("pagePath"))
    assert(h("product").dataType.asInstanceOf[StructType]
      .fieldNames.contains("productSKU"))
    // hits scalars nest one level only
    assert(h.fieldNames.contains("hitNumber") && h.fieldNames.contains("type"))
    // top-level ids stay top-level
    assert(s.fieldNames.contains("fullVisitorId"))
  }

  test("toFlat(toNested(df)) is the identity on export and session tables") {
    Seq(
      GaPipeline.exportTable(
        graft.operators.Ecommerce.explodeProducts(
          GaPipeline.withDerivedColumns(GaPipeline.sessionized(hits)))
          .withColumn("product_revenue", lit(null).cast("double"))),
      out.sessions
    ).foreach { df =>
      // identity up to column order: the flat export interleaves group
      // columns (hits_item_* appears in two runs), while the round-trip
      // emits each struct contiguously — names/types/values survive.
      val back = NestedSchema.toFlat(NestedSchema.toNested(df))
        .select(df.columns.map(col): _*)
      assert(back.columns.toSeq == df.columns.toSeq)
      assert(back.schema == df.schema)
      val key = df.columns.map(col)
      assert(back.orderBy(key: _*).collect().toSeq ==
        df.orderBy(key: _*).collect().toSeq)
    }
  }

  test("reshaping is metadata-only: adds no exchange over the flat plan") {
    assert(countExchanges(NestedSchema.toNested(out.pageviews)) ==
      countExchanges(out.pageviews))
  }

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
}
