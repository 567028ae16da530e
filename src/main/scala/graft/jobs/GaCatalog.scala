package graft.jobs

import org.apache.spark.sql.SparkSession

/** Catalog registration for the GA outputs — the Spark-native analog of
  * the reference's Glue crawler stage (`cloudformation/collector-ga.yaml:605-635`:
  * a 4am-cron crawler walks `aggregated/ga/daily/` so Athena can query
  * `type=sessions|pageviews|events|products|transactions|items`; the
  * partitioned landing layout is declared at `collector-ga.yaml:199`).
  *
  * Without this step the engine writes raw parquet paths and every
  * downstream SQL user hand-glues directory strings. With it, the daily
  * tree becomes ONE external partitioned table (`<db>.daily`, partition
  * columns `type/year/month/day` inferred from the `k=v` layout) plus the
  * unpartitioned session-history table (`<db>.sessions_history`), both
  * addressable by name from any SQL client of the same metastore.
  *
  * Mechanics: `CREATE TABLE ... USING parquet LOCATION` (external —
  * dropping the entry never touches data) followed by `ALTER TABLE ...
  * RECOVER PARTITIONS`, which lists the tree and registers every
  * partition in the metastore — exactly the crawler's contract, so
  * re-running after each daily write is the crawler's nightly re-crawl.
  * Scale note: with catalog-tracked partitions (Spark's default
  * `manageFilesourcePartitions`), a query's partition predicates are
  * answered FROM THE METASTORE — the driver never lists the full 100 TB
  * tree, and the scan's `PartitionFilters`/`PartitionCount` show the
  * pruning (asserted in GaPipelineSpec). On a cluster the same calls go
  * against the shared Hive/Glue metastore; locally they hit the
  * session's in-memory catalog, which implements the same partition API.
  */
object GaCatalog {

  /** Register (or re-sync, crawler-style) the GA tables for `outRoot`.
    * Idempotent: drops and re-creates the external entries, so a moved
    * `outRoot` or an evolved schema re-infers cleanly; data is never
    * touched. Safe to call after every [[DailyJob]] run. */
  def register(spark: SparkSession, outRoot: String, db: String = "ga"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def registerExternal(table: String, location: String, partitioned: Boolean): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $db.$table")
      spark.sql(s"CREATE TABLE $db.$table USING parquet LOCATION '$location'")
      if (partitioned) spark.sql(s"ALTER TABLE $db.$table RECOVER PARTITIONS")
    }
    registerExternal("daily", s"$outRoot/daily", partitioned = true)
    registerExternal("sessions_history", s"$outRoot/history/sessions",
      partitioned = false)
  }

  /** Per-type serving tables — `<db>.daily_<type>` rooted at
    * `daily/type=<type>` with `year/month/day` partitions. The unified
    * `daily` table's schema is whichever export type inference sampled
    * first, so TYPE-SPECIFIC columns (a session's trafficSource_source,
    * a pageview's hitNumber) are only reliably addressable through a
    * per-type root — which is also what the reference's crawler
    * produces in Athena practice: one clean-schema table per export
    * prefix. Types whose directory does not exist are skipped (a day-1
    * deployment may not have written transactions yet). Same
    * metastore-answered partition pruning as [[register]]. */
  def registerTyped(spark: SparkSession, outRoot: String, db: String = "ga",
                    types: Seq[String] = Seq("sessions", "pageviews",
                      "events", "products", "transactions", "items")): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val conf = spark.sessionState.newHadoopConf()
    types.foreach { tpe =>
      val loc = s"$outRoot/daily/type=$tpe"
      val p = new org.apache.hadoop.fs.Path(loc)
      if (p.getFileSystem(conf).exists(p)) {
        spark.sql(s"DROP TABLE IF EXISTS $db.daily_$tpe")
        spark.sql(s"CREATE TABLE $db.daily_$tpe USING parquet LOCATION '$loc'")
        spark.sql(s"ALTER TABLE $db.daily_$tpe RECOVER PARTITIONS")
      }
    }
  }

  /** Table + column statistics for the cost-based optimizer — the
    * ANALYZE step every warehouse's nightly crawler pairs with
    * registration: without catalog stats, CBO (`spark.sql.cbo.enabled`)
    * and join-reorder run on guesses; with them, row counts and column
    * NDV/min/max drive broadcast decisions and join order. One
    * stats-collection scan per table (the columns pass is
    * column-pruned); results persist in the metastore next to the
    * table entry, so every later session plans with them for free. */
  def analyze(spark: SparkSession, db: String, table: String,
              columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $db.$table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $db.$table COMPUTE STATISTICS " +
        s"FOR COLUMNS ${columns.mkString(", ")}")
  }
}
