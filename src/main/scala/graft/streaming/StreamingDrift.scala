package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q145 drift alarm: per event_type, each closed
  * hour bucket is judged against the trailing `baseline`-bucket ring —
  * |mean − base_mean| > 3σ/√n with the IDENTICAL double-expression
  * order as the batch query, so judged windows are value-equal, not
  * merely close (StreamingSpec asserts exact set equality).
  *
  * State per key is bounded: the open hour buckets still inside the
  * watermark horizon plus a ring of the last `baseline` CLOSED buckets
  * — four longs each, O(baseline + horizon/1h) regardless of event
  * volume, because events fold into integer moment sums on arrival
  * (the q143 discipline; the sums merge exactly in any order).
  *
  * Bucket lifecycle: events fold into their hour bucket; a bucket
  * closes once the watermark passes its end (judged iff a FULL ring
  * precedes it, then it joins the ring); an event-time timeout armed
  * just past the watermark drains remaining closed buckets on the
  * no-data batch that follows a watermark advance. Batch twin: q145 —
  * this operator is streaming-only by design (a batch run has no
  * watermark, so no bucket ever closes).
  */
object StreamingDrift {

  case class Ev(event_type: String, ts: Timestamp, mv: Long)
  case class Bucket(start: Long, n: Long, s: Long, s2: Long)
  case class DriftState(open: List[Bucket], ring: List[Bucket])
  case class Alarm(event_type: String, window_start_ms: Long, n_events: Long,
                   mean_mv: Double, base_mean: Double, alarm: Boolean)

  val HourMs: Long = 3600L * 1000

  def alarms(ds: Dataset[Ev], baseline: Int = 24,
             watermarkDelay: String = "2 hours"): Dataset[Alarm] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, Alarm](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, events, state: GroupState[DriftState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(DriftState(Nil, Nil))
          if (state.hasTimedOut) {
            val (closed, stillOpen) =
              st0.open.partition(b => b.start + HourMs <= wm)
            val (out, ring) =
              judge(key, closed.sortBy(_.start), st0.ring, baseline)
            // KEEP the ring even when no bucket stays open: a key that
            // goes quiet and later resumes must be judged against its
            // pre-gap baseline, exactly as q145's row frame does —
            // remove() here would silently restart the 24-window
            // warm-up and diverge from the batch twin. Ring state is
            // bounded (≤ baseline buckets of four longs), so a
            // forever-quiet key costs O(baseline), not a leak. Only re-arm
            // the timeout while buckets remain open; a kept ring with
            // nothing open needs no wake-up until new data arrives.
            state.update(DriftState(stillOpen, ring))
            if (stillOpen.nonEmpty) state.setTimeoutTimestamp(wm + 1)
            out.iterator
          } else {
            val open = scala.collection.mutable.Map(
              st0.open.map(b => b.start -> b).toSeq: _*)
            events.foreach { e =>
              val t = e.ts.getTime
              val start = t - java.lang.Math.floorMod(t, HourMs)
              val b = open.getOrElse(start, Bucket(start, 0L, 0L, 0L))
              open(start) =
                Bucket(start, b.n + 1, b.s + e.mv, b.s2 + e.mv * e.mv)
            }
            val (closed, stillOpen) =
              open.values.toList.partition(b => b.start + HourMs <= wm)
            val (out, ring) =
              judge(key, closed.sortBy(_.start), st0.ring, baseline)
            state.update(DriftState(stillOpen, ring))
            state.setTimeoutTimestamp(wm + 1)
            out.iterator
          }
      }
  }

  /** Fold newly-closed buckets (in start order) through the baseline
    * ring; a bucket is judged iff exactly `baseline` closed buckets
    * precede it — q145's `bw = 24` frame condition. The arithmetic is
    * the batch query's, token for token. */
  private def judge(key: String, closed: List[Bucket], ring0: List[Bucket],
                    baseline: Int): (List[Alarm], List[Bucket]) = {
    var ring = ring0
    val out = List.newBuilder[Alarm]
    closed.foreach { b =>
      if (ring.length == baseline) {
        val bn = ring.map(_.n).sum
        val bs = ring.map(_.s).sum
        val bs2 = ring.map(_.s2).sum
        val mean = b.s.toDouble / b.n.toDouble
        val baseMean = bs.toDouble / bn.toDouble
        val varB = (bs2.toDouble - bs.toDouble * bs.toDouble / bn.toDouble) /
          (bn - 1).toDouble
        val alarm = math.abs(mean - baseMean) >
          3.0 * math.sqrt(varB / b.n.toDouble)
        out += Alarm(key, b.start, b.n, mean, baseMean, alarm)
      }
      ring = (ring :+ b).takeRight(baseline)
    }
    (out.result(), ring)
  }
}
