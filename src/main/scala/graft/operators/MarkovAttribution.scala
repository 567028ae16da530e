package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. '14 — the standard
  * "data-driven attribution" model behind GA4's): user journeys become
  * a first-order Markov chain over channels with absorbing `conv` /
  * `null` states; a channel's value is its REMOVAL EFFECT — how much
  * the chain's start→conv absorption probability drops when every
  * transition into that channel is lost — and conversions are credited
  * proportionally. Unlike last-touch (`Attribution`) or the positional
  * credit model (q151), this prices each channel by what the OTHER
  * paths cannot replace.
  *
  * Journey semantics: per user, events ordered by (ts, tie) up to and
  * including the FIRST conversion event; `start` precedes the first
  * event; the conversion event maps to `conv`; a journey with no
  * conversion ends with a terminal → `null` transition. Consecutive
  * same-channel events keep their self-transitions (no collapsing —
  * documented choice, the chain stays first-order faithful).
  *
  * Determinism: transition probabilities are floor-ppm integers;
  * the absorption probabilities iterate a_s ← p(s→conv) +
  * ⌊Σ_c p(s→c)·a_c / 10⁶⌋ in exact Long arithmetic (`iters` fixed
  * rounds — geometric convergence, and every intermediate is an
  * order-independent integer sum), so base, removal effects, credits,
  * and attributed counts all hash-gate against a SQL mirror.
  *
  * Scale shape: the corpus-sized work is ONE window pass per user
  * (journeys) and a map-combinable transition count; the chain itself
  * is (channels+3)²-bounded — collected to the driver under the same
  * bounded-by-contract rule as k-means centroids, iterated in Longs,
  * and re-emitted as one row per channel. */
object MarkovAttribution {

  /** Per-channel report: `(channel, n_touches, base_cvr_ppm,
    * removed_cvr_ppm, removal_effect_ppm, credit_ppm,
    * attributed_conv, n_conversions)`. */
  def removalEffects(events: DataFrame, user: Column, ts: Column,
                     tie: Column, channel: Column, isConversion: Column,
                     iters: Int = 16): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select(user.as("u"), ts.as("_ts"), tie.as("_tie"),
      channel.as("c"), isConversion.as("cv"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("u").orderBy("_ts", "_tie")))
    val first = e.filter(col("cv")).groupBy("u").agg(min("rn").as("prn"))
    val j = e.join(first, Seq("u"), "left")
      .filter(col("prn").isNull || col("rn") <= col("prn"))
      .withColumn("state", when(col("cv"), "conv").otherwise(col("c")))
    val w = Window.partitionBy("u").orderBy("rn")
    val steps = j.select(
      coalesce(lag(col("state"), 1).over(w), lit("start")).as("from_s"),
      col("state").as("to_s"))
    // terminal transition for non-converting journeys: last state → null
    val lastRow = j.filter(col("prn").isNull)
      .withColumn("lrn", max("rn").over(Window.partitionBy("u")))
      .filter(col("rn") === col("lrn"))
      .select(col("state").as("from_s"), lit("null").as("to_s"))
    val counts = steps.unionByName(lastRow)
      .groupBy("from_s", "to_s").agg(count(lit(1)).as("n"))
    val probs = counts
      .withColumn("tot", sum("n").over(Window.partitionBy("from_s")))
      .withColumn("p_ppm", floor(lit(1000000L) * col("n") / col("tot"))
        .cast("long"))
    // the chain is (channels+3)²-bounded: bounded collect by contract
    val mat = probs.select("from_s", "to_s", "p_ppm", "n")
      .as[(String, String, Long, Long)].collect()
    val channels = mat.map(_._2).filter(t => t != "conv" && t != "null")
      .distinct.sorted
    val nConv = first.count()
    def p(v: Map[(String, String), Long])(f: String, t: String): Long =
      v.getOrElse((f, t), 0L)
    val pm = mat.map { case (f, t, pp, _) => (f, t) -> pp }.toMap
    // absorption probability a(start) with (optionally) one channel's
    // inbound transitions removed; exact Long arithmetic throughout
    def absorb(removed: Option[String]): Long = {
      val live = channels.filterNot(removed.contains)
      var a = live.map(_ -> 0L).toMap
      for (_ <- 1 to iters)
        a = live.map { s =>
          s -> (p(pm)(s, "conv") +
            live.map(c => p(pm)(s, c) * a(c)).sum / 1000000L)
        }.toMap
      p(pm)("start", "conv") +
        live.map(c => p(pm)("start", c) * a(c)).sum / 1000000L
    }
    val base = absorb(None)
    val removed = channels.map(c => c -> absorb(Some(c))).toMap
    val re = channels.map { c =>
      c -> (if (base > 0) 1000000L * (base - removed(c)) / base else 0L)
    }.toMap
    val sumRe = re.values.sum
    val touches = mat.groupBy(_._2).map { case (t, rows) =>
      t -> rows.map(_._4).sum
    }
    val rows = channels.toSeq.map { c =>
      (c, touches.getOrElse(c, 0L), base, removed(c), re(c),
        if (sumRe > 0) 1000000L * re(c) / sumRe else 0L,
        if (sumRe > 0) nConv * re(c) / sumRe else 0L,
        nConv)
    }
    rows.toDF("channel", "n_touches", "base_cvr_ppm", "removed_cvr_ppm",
      "removal_effect_ppm", "credit_ppm", "attributed_conv",
      "n_conversions")
  }
}
