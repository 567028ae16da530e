package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Newman–Girvan modularity (Newman & Girvan '04) — the standard "is
  * this partition real community structure?" score: Q = Σ_c (m_c/m −
  * (D_c/2m)²), comparing each community's intra-edge share against the
  * degree-preserving null model. The SCORER for any partition the
  * engine produces (connected components, label propagation, hash
  * buckets): detection without scoring can't tell structure from
  * chance — a random partition scores ≈ 0, genuine communities score
  * well above.
  *
  * Exactness: everything is brought to the common denominator 4m² —
  * per-community numerator q_c = 4·m_c·m − D_c², total Q_ppm =
  * ⌊10⁶·Σq_c / 4m²⌋ (negative totals truncate toward zero identically
  * on both engines). Long-safe while m < ~1.5·10⁹ edges — document
  * upstream if a graph exceeds that (then D_c² needs decimal).
  *
  * Scale shape: one membership join into the canonical edge list, one
  * degree groupBy, two label-bounded reductions, a 1-row broadcast for
  * m. Membership rows for nodes outside the graph are ignored (inner
  * joins on the graph's node set).
  */
object Modularity {

  /** Per-community rows `(community, n_nodes, m_intra, deg_sum, qc_num,
    * q_ppm)` — `qc_num` = 4·m_c·m − D_c² on the shared 4m² denominator,
    * `q_ppm` the partition-level total repeated on every row (the gate
    * column discipline). */
  def score(pairs: DataFrame, a: Column, b: Column,
            membership: DataFrame, node: Column, label: Column): DataFrame = {
    val e = pairs
      .select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val memb = membership.select(node.cast("long").as("node"),
      label.cast("long").as("community"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // SHUFFLE_HASH on the node-sized membership table (the
    // PageRank.step discipline): sort-merge would sort the edge list
    // twice (once per endpoint join); hash-building memb streams the
    // edges unsorted — the downstream aggregates are unordered counts/
    // sums, so results are identical. Not a broadcast: membership
    // grows with the node set.
    val labeled = e
      .join(memb.select(col("node").as("u"), col("community").as("cu"))
        .hint("SHUFFLE_HASH"), "u")
      .join(memb.select(col("node").as("v"), col("community").as("cv"))
        .hint("SHUFFLE_HASH"), "v")
    val intra = labeled.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community"))
      .agg(count(lit(1)).as("m_intra"))
    val degSum = deg.join(memb, "node")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_sum"))
    // label-bounded; eager-checkpoint BEFORE the total so the
    // corpus-sized joins run once, not once per consumer (the q191
    // normalizer lesson)
    val perC = degSum.join(intra, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("m_intra"), lit(0L)).as("m_intra"),
        col("deg_sum"), col("m"))
      .withColumn("qc_num",
        lit(4L) * col("m_intra") * col("m") - col("deg_sum") * col("deg_sum"))
      .localCheckpoint(true)
    val tot = perC.agg(sum("qc_num").as("qn"), max("m").as("_m"))
      .select(expr("(1000000L * qn) div greatest(4L * _m * _m, 1L)")
        .as("q_ppm"))
    val out = perC
      .crossJoin(broadcast(tot))
      .select("community", "n_nodes", "m_intra", "deg_sum", "qc_num",
        "q_ppm")
    e.unpersist()
    out
  }
}
