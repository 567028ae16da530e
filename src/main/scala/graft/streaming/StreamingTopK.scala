package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per key — SpaceSaving (Metwally et al.
  * '05) inside `flatMapGroupsWithState`: `capacity` counters per key,
  * an untracked arrival at full capacity REPLACES the minimum counter
  * (count = min+1, error = min), so memory is O(capacity) per key
  * forever while guaranteeing (a) every item with true frequency
  * > n/capacity is tracked and (b) for every tracked item
  * count − error ≤ true ≤ count. The streaming answer to q71's batch
  * CMS: an unbounded `groupBy(item).count()` would hold state for
  * every distinct item ever seen — the exact thing a 100 TB stream
  * cannot do.
  *
  * Determinism: arrivals inside a batch are folded in `seq` order
  * (Spark's group iterator has no ordering contract, so the operator
  * sorts each key's batch — the per-key-per-batch buffer is the
  * documented cost); eviction ties break to the lexicographically
  * smallest tracked item. Given a scripted batch sequence the state
  * and snapshots are bit-reproducible (spec-gated; SpaceSaving's
  * result is inherently arrival-order-dependent, so there is no
  * order-free oracle to hash against).
  *
  * Emission: after every batch that touched a key, the key's current
  * top-`k` snapshot `(key, batch_seq, rank, item, count, err)` in
  * (count DESC, item ASC) order — Update-mode semantics, the
  * monitoring read pattern.
  */
object StreamingTopK {

  case class Arrival(key: String, item: String, seq: Long)
  case class Counter(item: String, count: Long, err: Long)
  case class TopKState(counters: List[Counter], batches: Long)
  case class Snapshot(key: String, batch_seq: Long, rank: Int,
                      item: String, count: Long, err: Long)

  /** Fold one arrival into the counter set (pure; exposed for the
    * spec's brute-force replay). */
  def offer(counters: List[Counter], item: String,
            capacity: Int): List[Counter] =
    counters.find(_.item == item) match {
      case Some(c) =>
        c.copy(count = c.count + 1) :: counters.filterNot(_.item == item)
      case None if counters.size < capacity =>
        Counter(item, 1L, 0L) :: counters
      case None =>
        val victim = counters.minBy(c => (c.count, c.item))
        Counter(item, victim.count + 1L, victim.count) ::
          counters.filterNot(_.item == victim.item)
    }

  def topK(ds: Dataset[Arrival], capacity: Int, k: Int): Dataset[Snapshot] = {
    require(capacity >= 1 && k >= 1 && k <= capacity,
      s"need 1 <= k <= capacity: k=$k capacity=$capacity")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[TopKState, Snapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, arrivals, state: GroupState[TopKState]) =>
          val st0 = state.getOption.getOrElse(TopKState(Nil, 0L))
          // the group iterator has no ordering contract: buffer + sort
          // this key's batch so the fold is reproducible
          val batch = arrivals.toSeq.sortBy(_.seq)
          val counters = batch.foldLeft(st0.counters)(
            (cs, a) => offer(cs, a.item, capacity))
          val st1 = TopKState(counters, st0.batches + 1)
          state.update(st1)
          counters.sortBy(c => (-c.count, c.item)).take(k).zipWithIndex
            .map { case (c, i) =>
              Snapshot(key, st1.batches, i + 1, c.item, c.count, c.err)
            }.iterator
      }
  }
}
