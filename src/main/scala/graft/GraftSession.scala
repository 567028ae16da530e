package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (tests, Verify, Bench,
  * jobs) runs with identical, scale-aware settings.
  *
  * Settings rationale (100 TB target, tested on local[N]):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *    are the main levers that survive a 1000x scale-up unchanged.
  *  - shuffle.partitions defaults to the local core count; on a real cluster
  *    this is overridden (or left to AQE's coalescing with a high initial).
  *  - nanosAsLong: the driver's testdata carries parquet TIMESTAMP(NANOS),
  *    which Spark has no native type for; we read it as Long and normalize
  *    in [[graft.sources.Tables]] (truncation to micros matches DuckDB).
  *  - UTC session timezone for oracle parity (reference uses Europe/Berlin
  *    for its GA job — jobs that need it set it explicitly; see SURVEY §4).
  */
object GraftSession {
  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None
  ): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32))
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // GA body parse: duplicate query-string keys resolve to the LAST
      // occurrence, matching Python dict(parse_qsl(...)) in the reference
      // transformation Lambda (default EXCEPTION would throw).
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
  }

  /** Apply the graft defaults that can be set post-creation to an existing
    * session (used by Verify/Bench which own their builder). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
