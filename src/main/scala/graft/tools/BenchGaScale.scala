package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.jobs.GaPipeline
import graft.schema.GaSchemas

/** GA-pipeline throughput benchmark at synthetic scale.
  *
  * The checked-in fixture proves CORRECTNESS on 56 sessions; this tool
  * measures the full pipeline (sessionize → attribution → ecommerce
  * explode → 80-col export → sessions + 5 hit tables, all consumed via
  * the noop sink) on N generated hits, to show the plan's throughput is
  * bounded by the two designed shuffles, not by expression overhead.
  *
  * Generation is pure expressions over spark.range — parallel, no disk,
  * no RNG (hash-derived variety): every attribution branch, hit-type mix
  * (incl. dropped timing hits), purchases with two product slots, ~50
  * hits per visitor, a >30-min gap every 7th hit => ~8 sessions/visitor.
  *
  *   usage: BenchGaScale [nHits] [cores]   (default 2,000,000 on 32)
  */
object BenchGaScale {

  val BaseMs: Long = 1569225600000L // 2019-09-23T08:00:00Z

  /** Synthetic enriched-hit table with the full 267-col schema. */
  def syntheticHits(spark: SparkSession, n: Long, visitors: Long): DataFrame = {
    val id = col("id")
    val hitIdx = (id / visitors).cast("long") // per-visitor hit number
    val variant = pmod(hash(id), lit(10))
    // every 7th hit jumps > 30 min => a new session
    val ts = lit(BaseMs) + hitIdx * 120000L + (hitIdx / 7).cast("long") * 1860000L
    val pageUrl = concat(lit("https://shop.example.com/c/"),
      pmod(hash(id * 7), lit(40)), lit("/p/"), pmod(hash(id * 13), lit(500)))
    val provided: Map[String, Column] = Map(
      "message_id" -> concat(lit("m"), id),
      "received_at_apig" -> ts.cast("string"),
      "ip" -> concat(lit("203.0."), pmod(id, lit(200)), lit(".0")),
      "user_agent" -> lit("Mozilla/5.0 (X11; Linux x86_64) Chrome/76.0"),
      "body_cid" -> concat(lit("u"), pmod(id, lit(visitors))),
      "body_tid" -> lit("UA-000001-1"),
      "body_v" -> lit("1"),
      "body_t" -> when(variant === 0, "event")
        .when(variant === 1, "timing")
        .otherwise("pageview"),
      // attribution variety: utm / gclid / referrer / direct
      "body_dl" -> when(variant === 2, concat(pageUrl, lit("?utm_source=news&utm_medium=email&utm_campaign=fall")))
        .when(variant === 3, concat(pageUrl, lit("?gclid=abc123")))
        .otherwise(pageUrl),
      "body_dr" -> when(variant === 4, lit("https://www.google.com/search?q=shoes"))
        .when(variant === 5, lit("https://blog.partner-site.com/post/1"))
        .otherwise(lit(null).cast("string")),
      "body_dt" -> lit("Product page"),
      // purchases: every event hit is a 2-product purchase
      "body_pa" -> when(variant === 0, "purchase"),
      "body_ec" -> when(variant === 0, "ecommerce"),
      "body_ea" -> when(variant === 0, "purchase"),
      "body_ti" -> when(variant === 0, concat(lit("T"), id)),
      "body_tr" -> when(variant === 0, lit("59.98")),
      "body_pr0id" -> when(variant === 0, concat(lit("SKU"), pmod(id, lit(300)))),
      "body_pr0nm" -> when(variant === 0, lit("Thing One")),
      "body_pr0br" -> when(variant === 0, lit("BrandA")),
      "body_pr0pr" -> when(variant === 0, lit("19.99")),
      "body_pr0qt" -> when(variant === 0, lit("1")),
      "body_pr1id" -> when(variant === 0, concat(lit("SKU"), pmod(id + 1, lit(300)))),
      "body_pr1nm" -> when(variant === 0, lit("Thing Two")),
      "body_pr1br" -> when(variant === 0, lit("BrandB")),
      "body_pr1pr" -> when(variant === 0, lit("39.99")),
      "body_pr1qt" -> when(variant === 0, lit("1")),
      "geo_country" -> lit("Germany"),
      "geo_city" -> lit("Berlin"),
      "device_is_bot" -> lit(false),
      "device_is_mobile" -> (pmod(id, lit(3)) === 0),
      "device_client_name" -> lit("Chrome"),
      "device_os_name" -> lit("Linux"),
      "device_device_type" -> lit("desktop"))
    val cols = GaSchemas.hitSchema.fields.toSeq.map { f =>
      provided.getOrElse(f.name, lit(null).cast(f.dataType)).as(f.name)
    }
    spark.range(n).select(cols: _*)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = args.lift(1).getOrElse("32")
    val spark = GraftSession.builder(master = s"local[$cores]",
      shufflePartitions = Some(cores.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save()

    val visitors = math.max(1L, n / 50)
    val hits = syntheticHits(spark, n, visitors)
    val history = GaPipeline.loadHistory(spark, "/nonexistent/_scale_hist")

    val t0 = System.nanoTime()
    val out = GaPipeline.run(hits, history, "2019-09-23")
    Seq(out.sessions, out.pageviews, out.events, out.products,
      out.transactions, out.items)
      .foreach(_.write.format("noop").mode("overwrite").save())
    val secs = (System.nanoTime() - t0) / 1e9
    val nSessions = out.sessions.count()
    println(f"""{"metric":"ga_pipeline_hits_per_sec","value":${(n / secs).toLong},"hits":$n,"visitors":$visitors,"sessions":$nSessions,"sec":$secs%.2f,"cores":$cores}""")
    spark.stop()
  }
}
