package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline-freshness monitoring — the Spark-native analog of the
  * reference's S10 CloudWatch path (`functions/monitoring/s3/main.py:4-19`
  * emits a `NewObjectAdded` metric per S3 arrival;
  * `collector-ga-monitoring.yaml:126-143` alarms when the hourly sum
  * drops below 1, with missing data treated as breaching).
  *
  * Two halves, matching the reference's two signals:
  *
  *  - [[FreshnessListener]] — a [[StreamingQueryListener]] attached to
  *    the session: every progress event updates per-query counters
  *    (rows seen, last progress, last time a batch carried DATA — empty
  *    batches keep a query "alive" but not "fresh", the
  *    TreatMissingData=breaching semantics). `report(staleAfterMs)`
  *    flags queries whose last data is older than the window — the
  *    alarm predicate, evaluated against an injectable clock so the
  *    spec can pin it deterministically. Driver-side O(#queries)
  *    state; nothing touches the executors.
  *
  *  - [[FreshnessMonitor.ofTable]] — the batch-side freshness probe for
  *    LANDED data (the reference's crawler-facing S3 check): max event
  *    time + row count of any table/path, one aggregate the optimizer
  *    answers from a scan of just the timestamp column.
  *
  * At 100 TB neither half changes: the listener consumes driver
  * callbacks regardless of cluster size, and the table probe is a
  * column-pruned scan (or a partition-pruned one if the caller filters
  * to recent partitions first).
  */
object FreshnessMonitor {

  /** `(max_ts_ms, n_rows)` of `tsCol` — the landed-data freshness probe.
    * Callers alarm on `now - max_ts_ms > threshold`, mirroring the
    * reference's LessThanThreshold-on-hourly-sum. */
  def ofTable(df: DataFrame, tsCol: String): (Option[Long], Long) = {
    val r = df.agg(
      max(unix_millis(col(tsCol).cast("timestamp"))).as("max_ms"),
      count(lit(1)).as("n")).head()
    (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))
  }
}

/** Per-query freshness state; see [[FreshnessMonitor]]. */
class FreshnessListener(clock: () => Long = () => System.currentTimeMillis())
    extends StreamingQueryListener {

  /** (name-or-id, totalRows, lastProgressMs, lastDataMs) — lastDataMs is
    * Long.MinValue until the first non-empty batch (breaching-by-default,
    * like TreatMissingData: breaching). */
  case class State(name: String, totalRows: Long, lastProgressMs: Long,
      lastDataMs: Long)

  case class Freshness(name: String, totalRows: Long, msSinceData: Long,
      stale: Boolean)

  private val states = new ConcurrentHashMap[String, State]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    val name = Option(e.name).getOrElse(e.id.toString)
    states.put(e.id.toString, State(name, 0L, clock(), Long.MinValue))
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val id = e.progress.id.toString
    val rows = e.progress.numInputRows
    val now = clock()
    states.compute(id, (_, prev0) => {
      val prev = if (prev0 == null)
        State(Option(e.progress.name).getOrElse(id), 0L, now, Long.MinValue)
      else prev0
      prev.copy(totalRows = prev.totalRows + rows, lastProgressMs = now,
        lastDataMs = if (rows > 0) now else prev.lastDataMs)
    })
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    () // keep final counters visible to report(); explicit clear() drops them

  /** The alarm predicate per live-or-finished query: stale iff no batch
    * with data inside the trailing window (never-any-data = stale,
    * msSinceData = Long.MaxValue). */
  def report(staleAfterMs: Long): Seq[Freshness] = {
    val now = clock()
    import scala.jdk.CollectionConverters._
    states.values().asScala.toSeq.sortBy(_.name).map { s =>
      val since =
        if (s.lastDataMs == Long.MinValue) Long.MaxValue else now - s.lastDataMs
      s match {
        case State(name, rows, _, _) =>
          Freshness(name, rows, since, since > staleAfterMs)
      }
    }
  }

  def clear(): Unit = states.clear()

  /** Attach to a session (idempotent per listener instance). */
  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
