package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.enrich.{GeoIp, UserAgent}
import graft.ingest.Ingest
import graft.schema.GaSchemas

class EnrichmentSpec extends SparkTestBase {

  private val rawSchema = StructType(Seq(
    StructField("recordId", StringType), StructField("data", StringType)))

  private lazy val ingested = Ingest.fromFirehose(
    spark.read.schema(rawSchema).json("fixtures/ga/raw/records.jsonl"))
  private lazy val enrichedFixture = Ingest.readEnrichedHits(
    spark, "fixtures/ga/enriched/year=2019/month=09/day=23")
  private lazy val ranges = GeoIp.loadRanges(spark, "fixtures/geo/ip_ranges.csv")

  test("UA enrichment reproduces the enriched fixture's device columns") {
    val mine = UserAgent.withDeviceColumns(ingested, col("user_agent"))
      .select(("message_id" +: GaSchemas.deviceFields).map(col): _*)
      .orderBy("message_id").collect()
    val want = enrichedFixture
      .select(("message_id" +: GaSchemas.deviceFields).map(col): _*)
      .orderBy("message_id").collect()
    assert(mine.length == want.length)
    mine.zip(want).foreach { case (a, b) => assert(a == b, s"\n got $a\nwant $b") }
  }

  test("bot rows carry only the bot flag") {
    val bots = UserAgent.withDeviceColumns(ingested, col("user_agent"))
      .filter(col("device_is_bot"))
    assert(bots.count() == 2) // v16's two hits
    assert(bots.filter(col("device_client_name").isNotNull).count() == 0)
  }

  test("GeoIP bucket join reproduces the enriched fixture's geo columns (v4)") {
    val withBot = UserAgent.withDeviceColumns(ingested, col("user_agent"))
    val mine = GeoIp.withGeoColumns(withBot, ranges, col("ip"), col("device_is_bot"))
      .filter(col("body_cid") =!= "cid-v19") // v6 visitor: dimension is v4-only
      .select(("message_id" +: GaSchemas.geoFields).map(col): _*)
      .orderBy("message_id").collect()
    val want = enrichedFixture
      .filter(col("body_cid") =!= "cid-v19")
      .select(("message_id" +: GaSchemas.geoFields).map(col): _*)
      .orderBy("message_id").collect()
    assert(mine.length == want.length)
    mine.zip(want).foreach { case (a, b) => assert(a == b, s"\n got $a\nwant $b") }
  }

  test("lookup miss yields (not set) strings and null lat/lon; bots all-null") {
    import spark.implicits._
    val df = Seq(("10.9.9.9", false), ("84.113.10.61", true), ("::1", false))
      .toDF("ip", "bot")
    val out = GeoIp.withGeoColumns(df, ranges, col("ip"), col("bot"))
      .select("geo_country", "geo_latitude").collect()
    assert(out(0).getString(0) == "(not set)" && out(0).isNullAt(1)) // miss
    assert(out(1).isNullAt(0)) // bot: skipped lookup
    assert(out(2).getString(0) == "(not set)") // v6 = miss
  }

  test("geo join is a broadcast hash join, not a nested loop") {
    val plan = GeoIp.withGeoColumns(ingested, ranges, col("ip"), lit(false))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
