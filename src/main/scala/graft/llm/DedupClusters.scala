package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: turn verified near-duplicate PAIRS
  * (from [[MinHashLsh.verifiedPairs]], [[MinHashLsh.jaccardJoin]],
  * [[SimHash.nearPairs]] or [[Similarity.cosineDupPairs]]) into
  * connected components, and pick one survivor per component — the final
  * step of a training-data dedup pipeline ("drop all but one of each
  * duplicate cluster").
  *
  * Components come from MIN-LABEL PROPAGATION (the standard distributed
  * connected-components loop, cf. the map-reduce CC literature's
  * hash-to-min variant): every node starts labeled with its own id; each
  * round every node takes the minimum label among itself and its
  * neighbors; at fixpoint each component is labeled with its minimum
  * doc id. Each round is ONE shuffle (edge join + min-aggregate), and
  * the loop converges in O(component diameter) rounds — near-duplicate
  * graphs are dense little cliques (diameter 1-3), so 3-4 rounds is
  * typical. The driver loop checks an exact convergence metric per
  * round; labels only ever decrease, so `sum(label)` unchanged ⇔ no
  * label changed (no extra join needed).
  *
  * Scale notes: `localCheckpoint` truncates the growing lineage each
  * round (on a production cluster with unreliable executors, swap for
  * reliable `checkpoint` on durable storage); for graphs with LARGE
  * diameters (not dedup graphs) the large-star/small-star doubling
  * variant cuts rounds to O(log n).
  */
object DedupClusters {

  /** (doc_id, cluster_id) for every doc that appears in `pairs`;
    * cluster_id = the minimum doc_id of the component. */
  def components(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // persisted WITH hashpartitioning(b) (the PageRank buildGraph
    // discipline): every round's join probes edges BY `b`, so an
    // InMemoryRelation that already carries that partitioning turns
    // the per-round edge exchange into a cache read — without it the
    // edge table re-shuffles every round
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .repartition(col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Initialize with propagation round 1 already applied: label(v) =
    // min(v, neighbors(v)) in the same aggregation that discovers the
    // node set. Dedup components are near-cliques, so this init is
    // usually already the fixpoint and the loop below runs once, only to
    // confirm convergence.
    var labels = edges.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("label"))
      .select(col("a").as("doc_id"), col("label"))
      .localCheckpoint(true)
    var metric = labels.agg(sum(col("label").cast("decimal(28,0)"))).head.getDecimal(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // SHUFFLE_HASH on the node-sized label table: sort-merge would
      // re-SORT the cached edges every round (cache keeps partitioning,
      // not ordering); a hash build of labels streams edges unsorted —
      // min-aggregation is order-independent, so results are identical
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("label").as("lb"))
          .hint("SHUFFLE_HASH"), "b")
        .groupBy(col("a")).agg(min(col("lb")).as("nl"))
      val next = labels
        .join(nbrMin, labels("doc_id") === nbrMin("a"), "left")
        .select(labels("doc_id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
      val nextMetric = next.agg(sum(col("label").cast("decimal(28,0)"))).head.getDecimal(0)
      converged = nextMetric == metric
      metric = nextMetric
      labels = next
      iter += 1
    }
    edges.unpersist()
    // Fail LOUDLY on iteration exhaustion: returning the partial labels
    // would silently split components (wrong cluster ids, duplicate
    // survivors). Real dedup graphs converge in a handful of rounds; a
    // graph that doesn't either needs a larger maxIter or the
    // large-star/small-star doubling variant.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds — " +
        "raise maxIter (component diameter exceeds it)")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Documents that survive dedup: everything except the non-canonical
    * members (doc_id ≠ cluster minimum) of each duplicate cluster.
    * Unpaired documents survive untouched — they never enter the
    * component computation, so the anti-join is against the (small)
    * duplicate set, not the corpus. */
  def survivors(docs: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    // Join on a reserved scratch name, dropped before returning: a
    // `withColumn("doc_id", id)` would silently overwrite any unrelated
    // doc_id column when the caller's id is some OTHER expression,
    // changing the output schema (round-3 advice).
    require(!docs.columns.contains("_graft_id"),
      "input must not contain the reserved column _graft_id")
    val drop = components(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("_graft_id"))
    docs.withColumn("_graft_id", id)
      .join(drop, Seq("_graft_id"), "left_anti")
      .drop("_graft_id")
  }
}
