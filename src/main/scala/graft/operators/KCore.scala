package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core extraction — the density-peeling curation step on a
  * similarity/co-occurrence graph (Seidman '83's subgraph: the maximal
  * subgraph where every node keeps degree ≥ k). On a near-dup or
  * co-purchase graph the k-core separates genuinely dense communities
  * from stars and chains: a star hub has huge degree but dies in round
  * one when its leaves (degree 1) peel away — exactly the
  * tight-cluster-vs-popular-node distinction raw degree cannot make.
  *
  * Algorithm: synchronous peeling to the FIXPOINT — each round drops
  * every node whose current degree is < k, then the edges touching it;
  * removals cascade (a node can fall under k because its neighbors
  * peeled). Deterministic by construction: the surviving subgraph is
  * unique regardless of round grouping, so a bounded unrolled replay
  * that reaches the same fixpoint is bit-identical.
  *
  * Scale shape per round: one integer degree groupBy + two leftsemi
  * joins against the shrinking persisted edge set — three exchanges on
  * a frame that only loses rows; the convergence check is a single
  * driver-side Long (edge count), the [[PageRank]] discipline. Rounds
  * to fixpoint = the peel-wave depth of the graph (the longest chain of
  * cascading removals), typically O(10) even on web-scale graphs;
  * `maxRounds` is a runaway guard, not a tuning knob.
  */
object KCore {

  /** Full coreness (graph degeneracy) per node via the h-index
    * iteration (Lü et al. '16, "The H-index of a network node"):
    * c₀ = degree; c_{k+1}(v) = H-index of the neighbors' c_k (the
    * largest h with ≥ h neighbors at value ≥ h); the sequence is
    * monotone non-increasing and its fixpoint IS the core number —
    * every node's k-core membership for every k at once, where
    * [[subgraph]] answers one k. Deterministic: integer state, and the
    * H-index of a multiset is order-independent (row_number ties among
    * equal values cannot change it).
    *
    * Scale shape per round: one equi-join of the node state into the
    * persisted symmetric edge list + one per-node window (sort by
    * value inside the node's partition) + one integer max — the same
    * exchanges every round over a FIXED graph; convergence check is
    * one driver-side Long (changed-node count).
    *
    * `(node, coreness, converged)`. */
  def coreness(pairs: DataFrame, a: Column, b: Column,
               maxRounds: Int = 64): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e0 = pairs
      .select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val edges = e0
      .union(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v"))
      .persist(lvl)
    var state = edges.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    import org.apache.spark.sql.expressions.Window
    while (!converged && round < maxRounds) {
      val nb = edges.join(state.withColumnRenamed("node", "v"), Seq("v"))
        .select(col("u").as("node"), col("c"))
      val rn = nb.withColumn("rn", row_number().over(
        Window.partitionBy("node").orderBy(col("c").desc)))
      val next = rn.groupBy("node")
        .agg(coalesce(max(when(col("c") >= col("rn"), col("rn"))), lit(0))
          .cast("long").as("c"))
        .localCheckpoint(true)
      val changed = next.join(state.withColumnRenamed("c", "c0"), "node")
        .filter(col("c") =!= col("c0")).count()
      state = next
      converged = changed == 0L
      round += 1
    }
    edges.unpersist()
    state.select(col("node"), col("c").as("coreness"),
      lit(converged).as("converged"))
  }

  /** `(node, core_deg, converged)` for the nodes of the k-core of the
    * undirected graph in `pairs` (any orientation; dups and self-loops
    * dropped). `core_deg` is the node's degree INSIDE the core (≥ k by
    * definition); `converged` is false only if `maxRounds` stopped the
    * peel early (the bounded-oracle gate — a hash-green run proves the
    * fixpoint was reached).
    */
  def subgraph(pairs: DataFrame, a: Column, b: Column, k: Int,
               maxRounds: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val lvl = StorageLevel.MEMORY_AND_DISK
    var cur = pairs
      .select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(lvl)
    var nEdges = cur.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds && nEdges > 0L) {
      val alive = cur.select(col("u").as("node"))
        .union(cur.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
      val next = cur
        .join(alive.withColumnRenamed("node", "u"), Seq("u"), "leftsemi")
        .join(alive.withColumnRenamed("node", "v"), Seq("v"), "leftsemi")
        .select("u", "v")
        // eager checkpoint: round r never re-runs rounds 1..r-1, and the
        // previous round's cache can be dropped immediately
        .localCheckpoint(true)
      val nNext = next.count()
      cur.unpersist()
      cur = next
      converged = nNext == nEdges
      nEdges = nNext
      round += 1
    }
    if (nEdges == 0L) converged = true // empty graph is its own fixpoint
    cur.select(col("u").as("node"))
      .union(cur.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
      .withColumn("converged", lit(converged))
  }
}
