package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank — the canonical iterative-join-aggregate
  * workload, next to [[graft.llm.DedupClusters]]'s min-label
  * propagation: rank flows along out-edges, damped, for a declared
  * number of power iterations.
  *
  * Dangling nodes get a SELF-LOOP at build time (the standard
  * engineering normalization: every node then has outdeg >= 1 and no
  * global dangling-mass reduction — a full-graph sum whose float fold
  * order no distributed engine can pin — is needed). With that, every
  * per-iteration value is a per-NODE fold, and each fold runs in
  * ascending source-node order (the q55/q75 sorted-struct trick), so
  * the doubles are bit-identical across partitionings AND to the
  * DuckDB oracle's unrolled-CTE mirror (q100).
  *
  * Scale shape per iteration: one equi-join (ranks × edges, both
  * hash-partitioned on the join key) and one groupBy(dst) — the
  * textbook Pregel step as two exchanges; the node list and N are
  * reused. Plans are truncated with localCheckpoint every iteration
  * (DedupClusters precedent) so iteration k doesn't re-run 1..k-1 and
  * the optimizer never sees an unbounded DAG. In-degree bounds the
  * per-node fold state; there is no global collect anywhere.
  */
object PageRank {

  /** `(node, rank)` after `iters` damped iterations over the DISTINCT
    * directed edges in `edges` (columns `src`, `dst`; self-loops added
    * for dangling nodes; nodes = src ∪ dst). */
  def ranks(edges0: DataFrame, src: Column, dst: Column,
            iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    val (g, nodes) = buildGraph(edges0, src, dst)
    val n = col("n").cast("double")
    var ranks = nodes.crossJoin(broadcast(g.select(col("n")).limit(1)))
      .select(col("node"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters)
      ranks = step(g, ranks, damping).localCheckpoint(true)
    g.unpersist()
    ranks
  }

  /** Edge table (persisted WITH hashpartitioning(src) — see comment
    * inside) + node list. Exposed package-private so PlanSpec can
    * assert the per-iteration plan really reuses the cached
    * partitioning; callers must unpersist the first element. */
  private[graft] def buildGraph(edges0: DataFrame, src: Column,
      dst: Column): (DataFrame, DataFrame) = {
    val e0 = edges0.select(src.cast("long").as("src"),
      dst.cast("long").as("dst")).distinct()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
    // self-loop for every node with no out-edge
    val dangling = nodes.join(e0.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .select(col("node").as("src"), col("node").as("dst"))
    val edges = e0.union(dangling)
      .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
    // out-degree as a map-combinable groupBy + co-partitioned join (a
    // window by src would ship a hub node's whole edge list to one
    // task). PERSIST the edge table rather than checkpointing it: an
    // InMemoryRelation keeps its hashpartitioning(src), so the
    // per-iteration join probes the cached, already-partitioned edges
    // instead of re-shuffling the big side every round (a checkpoint's
    // ExistingRDD reports unknown partitioning and costs 1 edge shuffle
    // PER ITERATION). Unpersisted after the last iteration.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val g = edges.join(deg, "src").repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (g, nodes)
  }

  /** Bucket width of the two-level deterministic fold: level 1 folds a
    * dst's contributions within each `src div width` bucket (buffer ≤
    * width entries), level 2 folds the bucket sums in bucket order
    * (buffer ≤ id-space / width entries). A single-level
    * `collect_list` per dst materializes a celebrity node's ENTIRE
    * in-neighbor list in one aggregation buffer — the round-14 verdict's
    * OOM shape on a power-law graph (guide §2.5 skew / §5 spill); the
    * two levels bound both buffers at ~2²⁰ for any graph below ~2⁴⁰
    * node ids while keeping the fold order fixed: (bucket asc, src asc)
    * IS ascending src, and the DuckDB oracle mirrors the identical
    * two-level association, so the doubles replay exactly. */
  private[graft] val FoldBucketWidth = 1L << 20

  /** One un-checkpointed power iteration: rank/outdeg along edges,
    * per-dst source-sorted two-level fold, damping. The loop body
    * PlanSpec pins. */
  private[graft] def step(g: DataFrame, ranks: DataFrame,
      damping: Double): DataFrame = {
    // SHUFFLE_HASH on the node-sized rank table: the default sort-merge
    // join re-SORTS the cached edge table every iteration (the cache
    // keeps hashpartitioning(src) but no ordering) — a hash build of
    // the small side streams the edges unsorted, same rows moved, zero
    // per-iteration edge sorts. NOT a broadcast: the rank table grows
    // with the node set, and the whole point of the per-iteration
    // exchange budget is surviving graphs whose node list does not fit
    // one machine. The per-dst fold below is source-sorted, so join
    // strategy cannot move a bit of the doubles.
    val contribs = g.join(ranks.hint("SHUFFLE_HASH"),
        g("src") === ranks("node"))
      .select(g("src"), g("dst"), g("n"),
        (col("rank") / col("outdeg").cast("double")).as("contrib"))
    // Two-level fixed-order fold (round-14 verdict #4): bucket sums in
    // ascending src order inside each `src div W` bucket, then the
    // bucket sums in ascending bucket order — same deterministic
    // replayable doubles (the oracle mirrors the association exactly),
    // but NO buffer ever holds a full in-degree's rows: a celebrity
    // dst's fold state is bounded by the bucket width at level 1 and by
    // id-space/width at level 2. `div` truncates toward zero on both
    // engines and is monotone in src, so (bucket, src) order IS src
    // order. The level-2 exchange ships one row per (dst, bucket) —
    // noise next to the contribution shuffle it rides behind.
    val bucketed = contribs
      .groupBy(col("dst"), expr(s"src div ${FoldBucketWidth}L").as("bk"))
      .agg(first(col("n")).as("n"),
        aggregate(sort_array(collect_list(struct(col("src"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("bs"))
    val summed = bucketed.groupBy(col("dst"))
      .agg(first(col("n")).as("n"),
        aggregate(sort_array(collect_list(struct(col("bk"), col("bs")))),
          lit(0.0), (acc, x) => acc + x.getField("bs")).as("s"))
    ranks.select(col("node"))
      .join(summed.select(col("dst").as("node"), col("n"), col("s"))
        .hint("SHUFFLE_HASH"), Seq("node"), "left")
      .crossJoin(broadcast(g.select(col("n").as("_n")).limit(1)))
      .select(col("node"),
        (lit(1.0 - damping) / col("_n").cast("double") +
          lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
  }
}
