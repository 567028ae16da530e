package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.enrich.{GeoIp, UserAgent}
import graft.ingest.Ingest

/** Streaming front-half of the reference pipeline — its transformation +
  * enrichment Lambdas (stages 2-3, SURVEY §0) as ONE Structured-Streaming
  * job: raw Firehose records stream in, envelope decode / IP anonymization
  * / GA body parse (S7+P9+P10), user-agent and GeoIP enrichment (P11+P12)
  * run as the same pure expressions + broadcast join the batch path uses
  * (nothing is reimplemented — stateless stages compose into streams
  * unchanged), and the enriched zone lands as date-partitioned parquet
  * (the reference's year=/month=/day= S3 layout) under a checkpoint.
  *
  * Downstream, [[StreamingJob]] (or the batch [[DailyJob]]) consumes the
  * enriched zone — together they stream the reference end-to-end with
  * exactly-once sinks instead of at-least-once Lambda retries.
  */
object StreamingIngestJob {

  val rawSchema: StructType = StructType(Seq(
    StructField("recordId", StringType), StructField("data", StringType)))

  def start(spark: SparkSession, rawRoot: String, geoRangesPath: String,
            outPath: String, checkpoint: String,
            availableNow: Boolean = true) = {
    val raw = spark.readStream.schema(rawSchema).json(rawRoot)
    val ingested = Ingest.fromFirehose(raw)
    val withDevice = UserAgent.withDeviceColumns(ingested, col("user_agent"))
    val enriched = GeoIp.withGeoColumns(withDevice,
      GeoIp.loadRanges(spark, geoRangesPath),
      col("ip"), col("device_is_bot"))
    val ts = Ingest.receivedAtTs(col("received_at_apig"))
    val partitioned = enriched
      .withColumns(Map(
        "year" -> date_format(ts, "yyyy"),
        "month" -> date_format(ts, "MM"),
        "day" -> date_format(ts, "dd")))
    val writer = partitioned.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day")
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: StreamingIngestJob <rawRoot> <geoRangesCsv> <outPath> <checkpoint>")
    val spark = graft.GraftSession.local()
    val q = start(spark, args(0), args(1), args(2), args(3))
    q.awaitTermination()
    spark.stop()
  }
}
