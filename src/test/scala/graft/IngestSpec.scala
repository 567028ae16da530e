package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ingest.Ingest
import graft.schema.GaSchemas

class IngestSpec extends SparkTestBase {

  private val rawSchema = StructType(Seq(
    StructField("recordId", StringType), StructField("data", StringType)))

  test("IP anonymization matches reference semantics (v4 / v6 / garbage)") {
    import spark.implicits._
    val out = Seq("255.255.255.255", "84.113.251.61",
      "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff", "2001:db8:85a3:8d3:1319:8a2e:370:7348",
      "localhost", "", ".bad.lead", ":bad")
      .toDF("ip").select(Ingest.anonymizeIp($"ip").as("a")).as[String].collect().toSeq
    assert(out == Seq(
      "255.255.255.0", "84.113.251.0",
      "ffff:ffff:ffff:0000:0000:0000:0000:0000", "2001:db8:85a3:0000:0000:0000:0000:0000",
      "0.0.0.0", "0.0.0.0", "0.0.0.0", "0.0.0.0"))
  }

  test("GA body parse: decode, blank-drop, last-dup-wins") {
    import spark.implicits._
    val out = Seq("t=pageview&dl=https%3A%2F%2Fx.example%2Fa%3Fb%3D1&el=&cu=EUR&cu=USD&k+y=v+1")
      .toDF("body")
      .select(Ingest.parseGaBody($"body").as("m"))
      .select(
        element_at($"m", "t").as("t"),
        element_at($"m", "dl").as("dl"),
        element_at($"m", "el").as("el"),
        element_at($"m", "cu").as("cu"),
        element_at($"m", "k y").as("ky"))
      .collect().head
    assert(out.getString(0) == "pageview")
    assert(out.getString(1) == "https://x.example/a?b=1")
    assert(out.isNullAt(2))      // blank value dropped (parse_qsl default)
    assert(out.getString(3) == "USD") // duplicate key: last wins
    assert(out.getString(4) == "v 1") // '+' decodes to space in key and value
  }

  test("raw fixture -> fromFirehose reproduces the enriched fixture's envelope+body columns") {
    val raw = spark.read.schema(rawSchema).option("mode", "FAILFAST")
      .json("fixtures/ga/raw/records.jsonl")
    val ingested = Ingest.fromFirehose(raw)

    val enriched = Ingest.readEnrichedHits(
      spark, "fixtures/ga/enriched/year=2019/month=09/day=23")

    val cols = (GaSchemas.apiGatewayFields ++
      GaSchemas.allHitFields.filter(_.startsWith("body_"))).map(col)

    val a = ingested.select(cols: _*).orderBy("message_id").collect()
    val b = enriched.select(cols: _*).orderBy("message_id").collect()
    assert(a.length == 175 && a.length == b.length)
    a.zip(b).foreach { case (ra, rb) => assert(ra == rb, s"row mismatch: $ra vs $rb") }
  }

  test("S6: concatenated-JSON repair splits glued records losslessly") {
    val repaired = Ingest.repairConcatenatedJson(
      spark, "fixtures/ga/raw/concatenated.json")
    assert(repaired.count() == 30)
    val ids = repaired
      .select(get_json_object(col("record"), "$.message_id").as("m"))
      .filter(col("m").isNotNull)
    assert(ids.count() == 30)
  }

  test("S8: Firehose response marks undecodable records ProcessingFailed") {
    import spark.implicits._
    val raw = Seq(("r1", java.util.Base64.getEncoder.encodeToString(
      """{"message_id":"m1","ip":"1.2.3.4"}""".getBytes)),
      ("r2", "!!!notbase64json!!!")).toDF("recordId", "data")
    val env = raw.withColumn("_env", Ingest.decodeEnvelope(col("data")))
    val out = Ingest.toFirehoseResponse(env, col("recordId"),
      to_json(col("_env")), col("_env.message_id").isNull)
      .orderBy("recordId").collect()
    assert(out(0).getString(1) == "Ok" && !out(0).isNullAt(2))
    assert(out(1).getString(1) == "ProcessingFailed" && out(1).isNullAt(2))
    // the Ok payload round-trips: b64 decode ends with the record + newline
    val decoded = new String(java.util.Base64.getDecoder.decode(out(0).getString(2)))
    assert(decoded.endsWith("\n") && decoded.contains("\"message_id\":\"m1\""))
  }

  test("enriched scan pads ragged records to the full 267-column schema") {
    val df = Ingest.readEnrichedHits(
      spark, "fixtures/ga/enriched/year=2019/month=09/day=23")
    assert(df.schema.size == 267)
    // a column no fixture row carries is still present and all-null
    assert(df.filter(col("body_pr19cc").isNotNull).count() == 0)
    assert(df.count() == 175)
  }
}
