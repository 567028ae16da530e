package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention and funnel analysis — the two classic
  * user-lifecycle aggregations of an event-analytics engine.
  *
  * Both are built from map-combinable aggregations keyed by user:
  * no windows, no per-user sorts, no driver materialization. The
  * user-keyed shuffles dominate and are unavoidable (the grain IS the
  * user); everything after them is dimension-sized.
  */
object Cohorts {

  /** Weekly retention matrix: users bucketed by the week of their FIRST
    * event (cohort), counted in each later week they were active.
    * Output: `(cohort_week: date, week_offset: long, n_users: long)`.
    *
    * Shape: one min-per-user aggregation (map-combinable), one distinct
    * (user, week) projection-aggregation (map-combinable), an
    * equi-join on user_id (both sides already hash-partitioned by
    * user_id, so the join reuses the exchange), and a final
    * dimension-sized groupBy. */
  def weeklyRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val firsts = events
      .select(user.as("user_id"), to_date(date_trunc("week", ts)).as("w"))
      .groupBy(col("user_id")).agg(min(col("w")).as("cohort_week"))
    val active = events
      .select(user.as("user_id"), to_date(date_trunc("week", ts)).as("active_week"))
      .distinct()
    active.join(firsts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling distinct active users (the WAU/MAU family): for every
    * calendar day in the events' span, the count of distinct users
    * active in the trailing `windowDays` window ending that day.
    *
    * Rolling COUNT DISTINCT can't come from a window function (distinct
    * state isn't mergeable across frames), so each (user, active day)
    * fact is exploded to the `windowDays` window-end days it
    * contributes to, then de-duplicated and counted — fan-out is
    * exactly `windowDays` per distinct user-day (bounded, map-side),
    * and both aggregations are map-combinable. Days with no active
    * users in the window simply produce no row. */
  def rollingActiveUsers(events: DataFrame, user: Column, ts: Column,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val userDays = events
      .select(user.as("user_id"), to_date(ts).as("d"))
      .distinct()
    val span = events.agg(max(to_date(ts)).as("max_d")) // 1 row, broadcasts
    userDays.crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(sequence(col("d"),
          least(date_add(col("d"), windowDays - 1), col("max_d"))))
          .as("window_end"))
      .distinct()
      .groupBy(col("window_end"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Ordered funnel: for each user, the first time each stage's
    * event-type fires STRICTLY AFTER the previous stage's first
    * completion (the classic "signup → view → purchase in order"
    * question; same-timestamp ties do not advance the funnel, so a
    * user needs distinct forward progress at every stage).
    *
    * Output: one row per user seen in stage-1 events:
    * `(user_id, t1_ms .. tN_ms: long|null, stage: long)` where `stage`
    * counts completed stages.
    *
    * Shape: per stage, a map-side type filter, an equi-join to the
    * accumulated per-user funnel times (user-keyed, co-partitioned),
    * and a conditional MIN — combinable, O(1) state per user, so a bot
    * user with millions of events never builds per-user arrays or
    * sorts. Stage count is fixed and small. */
  def funnel(events: DataFrame, user: Column, ts: Column, typ: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(user.as("user_id"), typ.as("_t"),
      unix_millis(ts).as("_ms"))
    // stage 1: first occurrence, unconditional
    var acc = base.where(col("_t") === stages.head)
      .groupBy(col("user_id")).agg(min(col("_ms")).as("t1_ms"))
    var i = 2
    for (stage <- stages.tail) {
      val prev = s"t${i - 1}_ms"
      val cur = s"t${i}_ms"
      // first ts of this stage STRICTLY AFTER the user's prev-stage
      // time: a null prev never satisfies `>`, so those users simply
      // produce no row and stay null through the left join
      val tj = base.where(col("_t") === stage)
        .join(acc.select(col("user_id"), col(prev)), "user_id")
        .where(col("_ms") > col(prev))
        .groupBy(col("user_id")).agg(min(col("_ms")).as(cur))
      acc = acc.join(tj, Seq("user_id"), "left")
      i += 1
    }
    val stageCols = (1 to stages.length).map(j => col(s"t${j}_ms"))
    acc.withColumn("stage",
      stageCols.map(c => when(c.isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }
}
