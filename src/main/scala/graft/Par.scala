package graft

/** Order-preserving parallel map over INDEPENDENT per-table/per-member
  * Spark jobs (guide §2.6: Spark happily runs several jobs at once; a
  * driver loop serializes them and leaves the executors idle through
  * every job's tail — submitting 2-3 jobs concurrently lets the next
  * job's tasks back-fill the executors the current job's stragglers
  * freed under FIFO scheduling). Results — and therefore every
  * gate/oracle value — are byte-identical to the sequential map; only
  * the job overlap changes. Width 3: enough to fill a tail, not enough
  * to thrash execution memory. Exceptions propagate unchanged (Await
  * rethrows the first failure).
  *
  * The single shared helper behind SparkEntry.parOrdered and
  * Erasure's member overlap (round-14 advice: two verbatim copies
  * drift on the next tweak). */
private[graft] object Par {
  def ordered[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    if (xs.lengthCompare(2) < 0) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(3, xs.length))
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        // force strictness BEFORE awaiting: a lazy Seq (Stream/view/
        // LazyList) would otherwise create each Future only when Await
        // reaches it, silently serializing the work this helper exists
        // to overlap (round-14 advice)
        val fs = xs.toVector.map(x => Future(f(x)))
        fs.map(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    }
}
