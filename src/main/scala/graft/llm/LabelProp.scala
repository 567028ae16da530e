package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a similarity graph — the
  * label-spreading step a curation pipeline runs when a SMALL audited
  * set carries trusted labels (spam / curated / license class) and the
  * near-duplicate graph is the evidence for everything else: a
  * document that is a near-dup of known spam is spam; one inside a
  * cluster of curated pages inherits that standing. (Zhu & Ghahramani
  * '02's propagation idea in the hard-label, iteration-bounded form of
  * Raghavan et al. '07's LPA — made DETERMINISTIC: synchronous rounds,
  * integer votes, ties to the smallest label, seeds clamped.)
  *
  * Per round, every non-seed node takes the majority label among its
  * currently-labeled neighbors (unlabeled neighbors do not vote; no
  * labeled neighbor → keep the previous label, possibly none); seed
  * nodes never change. A fixed `rounds` budget bounds both compute and
  * the oracle's unrolled replay — labels reach distance ≤ `rounds`
  * from a seed, which is the operational intent (a dup-of-a-dup chain,
  * not an unbounded flood).
  *
  * Scale shape per round ([[graft.operators.PageRank]] discipline):
  * one equi-join of the label frame against the persisted
  * hash-partitioned edge table + one integer groupBy — two exchanges,
  * the cached edge partitioning reused every round; the label frame is
  * localCheckpointed per round so round k never re-runs 1..k-1. Votes
  * are exact Longs; the argmax is a struct max with the label negated
  * (highest count, then smallest label) — no doubles anywhere, so the
  * whole labeling hash-gates.
  */
object LabelProp {

  /** `(id, seed_label, label)` after `rounds` synchronous vote rounds.
    * `nodes`: one row per node with a nullable integer seed label;
    * `pairs`: undirected similarity edges (any orientation, dups fine).
    */
  def propagate(nodes: DataFrame, id: Column, seedLabel: Column,
                pairs: DataFrame, a: Column, b: Column,
                rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    val n0 = nodes.select(id.cast("long").as("id"),
      seedLabel.cast("int").as("seed_label"))
    val e0 = pairs.select(a.cast("long").as("src"), b.cast("long").as("dst"))
    // symmetrize: votes flow both ways along an undirected edge
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = n0.select(col("id"), col("seed_label").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val votes = edges
        .join(labels.filter(col("label").isNotNull), col("src") === col("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = votes
        .groupBy(col("dst"))
        // lexicographic struct max = (highest count, smallest label)
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).cast("int").as("vote"))
      labels = n0
        .join(best, Seq("id"), "left")
        .join(labels.withColumnRenamed("label", "prev"), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("seed_label"), col("vote"), col("prev")).as("label"))
        .localCheckpoint(true)
    }
    edges.unpersist()
    n0.join(labels, Seq("id"), "left")
      .select(col("id"), col("seed_label"), col("label"))
  }
}
