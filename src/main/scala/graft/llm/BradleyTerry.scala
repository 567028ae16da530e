package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bradley–Terry strength estimation from pairwise preferences — the
  * aggregation step behind reward-model data curation and leaderboard
  * ranking (Chatbot-Arena-style): raw (winner, loser) judgments over
  * items become one strength per item, p_i, under the Bradley–Terry
  * '52 model P(i beats j) = p_i / (p_i + p_j). Fit by the classic MM
  * iteration (Zermelo '29 / Hunter '04): p'_i = W_i / Σ_j n_ij /
  * (p_i + p_j), normalized each round — each update provably increases
  * the likelihood and converges geometrically from the uniform start.
  *
  * Determinism (the q176 integer discipline): strengths live on a
  * 10⁶ grid (ppm). Per round every division is a positive integral
  * `div` on Longs and every sum is an exact integer sum — no doubles
  * anywhere, order-independent by construction, so the whole table
  * hash-gates against an unrolled SQL replay. Grid + fixed-round
  * truncation costs accuracy only (≪ the grid step after `rounds` ≥ 8
  * on connected graphs), never reproducibility.
  *
  * Bounds (documented, not silently wrapped): per-pair game counts and
  * per-item win counts must stay below 2⁶³/10⁹ ≈ 9.2·10⁹ — beyond any
  * real judgment corpus; items winning zero games pin at strength 0
  * (their BT MLE does not exist — standard MM behavior); per connected
  * component strengths are scaled within the shared 10⁶ budget.
  *
  * Scale shape per round: two hash joins of the m-row state against
  * the aggregated pair table (NOT the raw judgments — those fold once,
  * map-combinable, up front), one integer groupBy, one broadcast
  * scalar for the normalizer; state localCheckpointed so round k never
  * re-runs 1..k-1. Judgment volume is touched exactly once.
  */
object BradleyTerry {

  /** Above this item count the per-round state joins stop
    * BROADCASTING and fall back to SHUFFLE_HASH (round-14 verdict:
    * the m-bounded-state argument is sound for judgment workloads,
    * but an unbounded broadcast turns a huge item universe into a
    * driver/executor OOM where the old plan degraded gracefully).
    * 10⁶ (i, p) rows build a ~50 MB hash relation — comfortably
    * inside broadcast territory at any cluster size; beyond it the
    * hash-hinted shuffle join keeps the no-sort property and scales
    * with the partition count. */
  private[graft] val BroadcastStateMaxItems = 1000000L

  /** One MM round's un-normalized update pipeline — the m-bounded
    * state BROADCASTS into the persisted, already hash-partitioned
    * edge table: the round's two joins stop re-exchanging (and
    * re-sorting) edges, and the groupBy(i) rides the cached
    * hashpartitioning(i) — zero exchanges on the edge side per round
    * where the sort-merge form paid two plus the aggregation
    * exchange. `broadcastState = false` (m above
    * [[BroadcastStateMaxItems]]) swaps every broadcast for a
    * SHUFFLE_HASH hint — the i-side join still rides the cached
    * edge partitioning, the j-side exchanges by j as the original
    * sort-merge form did, minus its sorts. Integer sums are
    * order-independent, so the join strategy cannot move a single
    * ppm. Package-private so the plan dump tool commits exactly the
    * loop body's explain. */
  private[graft] def oneRoundPlan(edges: DataFrame, state: DataFrame,
                                  wins: DataFrame,
                                  broadcastState: Boolean = true): DataFrame = {
    def mSide(df: DataFrame): DataFrame =
      if (broadcastState) broadcast(df) else df.hint("SHUFFLE_HASH")
    val terms = edges
      .join(mSide(state.select(col("i"), col("p").as("pi"))), Seq("i"))
      .join(mSide(state.select(col("i").as("j"), col("p").as("pj"))),
        Seq("j"))
      .select(col("i"),
        expr("(n * 1000000000L) div greatest(pi + pj, 1L)").as("term"))
    terms.groupBy("i").agg(sum("term").as("d"))
      .join(mSide(wins), Seq("i"), "left")
      .select(col("i"),
        expr("(coalesce(wi, 0L) * 1000000000L) div greatest(d, 1L)")
          .as("raw"))
  }

  /** `(item, strength_ppm, wins, games)` for every item appearing in
    * at least one judgment. `prefs`: one row per judgment. */
  def fit(prefs: DataFrame, winner: Column, loser: Column,
          rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds out of range: $rounds")
    val wl = prefs.select(winner.cast("long").as("w"),
        loser.cast("long").as("l"))
      .filter(col("w") =!= col("l"))
      // the judgment stream feeds BOTH reductions below — persist so the
      // (possibly window-heavy) duel derivation runs once, not once per
      // consumer (bench r9: the unpersisted stream re-ran its window
      // every MM round through `wins`)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fold the judgment stream ONCE: directed game counts (i's view of
    // each opponent) and per-item wins — everything after is m-bounded
    val games = wl
      .select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = games.select(col("a").as("i"), col("b").as("j"), col("n"))
      .union(games.select(col("b").as("i"), col("a").as("j"), col("n")))
      .repartition(col("i"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // m-bounded and read every round: eager-checkpoint once
    val wins = wl.groupBy(col("w").as("i")).agg(count(lit(1)).as("wi"))
      .localCheckpoint(true)
    val items = edges.select("i").distinct()
    // uniform integer start: p0 = floor(1e6 / m)
    var state = items
      .crossJoin(broadcast(items.agg(count(lit(1)).as("_m"))))
      .select(col("i"), expr("1000000L div _m").as("p"))
      .localCheckpoint(true)
    // the broadcast-vs-shuffle gate needs m; counting the EAGERLY
    // CHECKPOINTED m-bounded state is a cache read, not another pass
    // over the edge table (a separate items.count() measured +1.2 s on
    // q191 — it materialized the edge cache one extra time)
    val broadcastState = state.count() <= BroadcastStateMaxItems
    for (_ <- 1 to rounds) {
      // m-bounded; eager-checkpoint BEFORE the normalizer so the
      // corpus-sized terms pipeline runs once per round, not twice
      // (the Z aggregate and the crossJoin would each re-evaluate it)
      val raw = oneRoundPlan(edges, state, wins, broadcastState)
        .localCheckpoint(true)
      state = raw
        .crossJoin(broadcast(raw.agg(sum("raw").as("_z"))))
        .select(col("i"),
          expr("(raw * 1000000L) div greatest(_z, 1L)").as("p"))
    }
    val out = state
      .join(if (broadcastState) broadcast(wins) else wins.hint("SHUFFLE_HASH"),
        Seq("i"), "left")
      .join(edges.groupBy("i").agg(sum("n").as("games")), Seq("i"))
      .select(col("i").as("item"), col("p").as("strength_ppm"),
        coalesce(col("wi"), lit(0L)).as("wins"), col("games"))
      .localCheckpoint(true)
    wl.unpersist(); games.unpersist(); edges.unpersist()
    out
  }
}
