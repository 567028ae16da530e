package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the fixed-semantics successor of the
  * reference's daily batch job (SURVEY §2.8): no midnight partition
  * boundary (sessions span days), no double-append on re-run
  * (checkpointed exactly-once sinks), late data handled by watermark
  * instead of being silently dropped.
  *
  * Two interchangeable routes:
  *  - [[sessionWindowAgg]]: the built-in `session_window` gap aggregation
  *    (watermark + append mode) — prefer this; Catalyst owns the state.
  *  - [[withCustomState]]: `flatMapGroupsWithState` with event-time
  *    timeout — the template for session logic the built-in can't express
  *    (e.g. per-session attribution carry-over).
  *
  * Both also run in BATCH (a `session_window` groupBy works on static
  * frames), which is what the oracle checks (q28).
  */
object StreamingSessionize {

  /** Gap-based session aggregate; works on both static and streaming
    * frames. `events` needs columns `user_id` and a ms-precision
    * timestamp `ts`. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"))
  }

  case class Ev(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_ms: Long,
                        session_end_ms: Long, n_events: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** Custom sessionizer: one open session per key in state; a new event
    * either extends it or closes it (emit) and opens the next; event-time
    * timeout flushes the open session once the watermark passes. */
  def withCustomState(ds: Dataset[Ev], gapMs: Long = GapMs): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.end, s.n))
          } else {
            val sorted = events.map(_.ts.getTime).toSeq.sorted
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.end < gapMs =>
                  // min-start: a watermark-admitted event can still be
                  // OLDER than the open session's start (cross-batch
                  // late data); the session's bounds must contain every
                  // event it counts
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** LIVE-SERVING sessionizer — [[withCustomState]]'s Update-mode twin:
    * every batch that touches a key emits the open session's CURRENT
    * aggregate (same (user_id, session_start_ms) key), plus the final
    * row of any session the batch closed, so a downstream keyed MERGE
    * ([[StreamingUpsert]]) serves sessions AS THEY GROW — each
    * refinement REPLACES the serving row in place, and the row stops
    * moving at its final value. The event-time timeout therefore has
    * nothing left to say: the last touch already emitted the final
    * aggregate, so timeout just drops state (no duplicate emission).
    *
    * Caveat the caller owns: a late event OLDER than the open
    * session's start MERGES into it with a min'd start — the session's
    * bounds always contain every event it counts, but the re-key (new
    * session_start_ms) means a keyed merge stores a second row and the
    * provisional row under the old start goes stale; and because the
    * one-open-session state cannot retroactively split, an admitted
    * event more than a gap before the start is absorbed rather than
    * opening its own earlier session. Within-gap FORWARD extension —
    * the overwhelmingly common late case — updates in place.
    * Reconciling stale rows/backward shifts is the q158 compactor's
    * job (the batch recompute is the ground truth).
    */
  def withLiveState(ds: Dataset[Ev], gapMs: Long = GapMs): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (userId, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove() // already served at its final value
            Iterator.empty
          } else {
            val sorted = events.map(_.ts.getTime).toSeq.sorted
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.end < gapMs =>
                  // min-start (see withCustomState): the re-key this
                  // causes under the (user_id, session_start_ms) merge
                  // key is the documented caveat below
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  out += SessionOut(userId, s.start, s.end, s.n) // final
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
              out += SessionOut(userId, s.start, s.end, s.n) // provisional
            }
            out.result().iterator
          }
      }
  }
}
