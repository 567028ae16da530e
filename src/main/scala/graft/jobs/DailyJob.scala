package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ingest.Ingest

/** The daily batch job — reference `main()` (sessionization/main.py:1335-1384):
  * read one day's enriched partition + session history, run the pipeline,
  * write history append + six daily overwrite tables.
  *
  * Layout (main.py:1344, 1354-1359):
  *   in:      <enrichedRoot>/year=Y/month=M/day=D
  *   history: <outRoot>/history/sessions            (append, S3)
  *   daily:   <outRoot>/daily/type=X/year=Y/month=M/day=D   (overwrite, S4)
  *
  * Writes `coalesce(1)` like the reference's repartition(1) (S5) — the
  * output of one day is small; at 100 TB/day this becomes a plain
  * partitioned parallel write (drop the coalesce), which is why it's a
  * parameter.
  */
object DailyJob {

  case class Paths(enrichedRoot: String, outRoot: String, jobDate: String) {
    private val Array(y, m, d) = jobDate.split("-")
    val enrichedDay = s"$enrichedRoot/year=$y/month=$m/day=$d"
    val historyPath = s"$outRoot/history/sessions"
    def daily(tpe: String) = s"$outRoot/daily/type=$tpe/year=$y/month=$m/day=$d"
  }

  def run(spark: SparkSession, paths: Paths, idAlgo: String = "sha1",
          coalesceOutput: Boolean = true,
          catalogDb: Option[String] = Some("ga")): GaPipeline.Outputs = {
    val hits = Ingest.readEnrichedHits(spark, paths.enrichedDay)
    val history = GaPipeline.loadHistory(spark, paths.historyPath)
    // Incremental touchpoints: every row dayOnly keeps belongs to a
    // visitor seen today, so the persisted output is identical to the
    // full-history recompute while the touchpoint stage scans only
    // today's visitors' history (see GaPipeline.run's contract).
    val out = GaPipeline.run(hits, history, paths.jobDate, idAlgo,
      incrementalTouchpoints = true)

    def dayOnly(df: DataFrame): DataFrame = {
      val filtered = df.filter(to_date(col("timestamp")) === lit(paths.jobDate))
      if (coalesceOutput) filtered.coalesce(1) else filtered
    }

    // History append first (S3), then the six daily overwrites (S4).
    dayOnly(out.sessions).write.mode("append").parquet(paths.historyPath)
    Seq(
      "sessions" -> out.sessions, "pageviews" -> out.pageviews,
      "events" -> out.events, "products" -> out.products,
      "transactions" -> out.transactions, "items" -> out.items
    ).foreach { case (tpe, df) =>
      dayOnly(df).write.mode("overwrite").parquet(paths.daily(tpe))
    }
    // Catalog re-sync after the writes — the reference's nightly crawler
    // (S5 serve stage); None skips it for path-only consumers.
    catalogDb.foreach(db => GaCatalog.register(spark, paths.outRoot, db))
    out
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DailyJob <enrichedRoot> <outRoot> <jobDate YYYY-MM-DD>")
    val spark = GraftSession.local()
    run(spark, Paths(args(0), args(1), args(2)))
    spark.stop()
  }
}
