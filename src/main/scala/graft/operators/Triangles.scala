package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-node triangle counting — the local-clustering signal on a
  * similarity/interaction graph (a near-dup cluster of size k is a
  * k-clique: its members each sit in C(k-1,2) triangles, so triangle
  * counts separate tight dup cliques from chain-like borderline
  * matches; on a co-visit graph it is the classic community-density
  * metric).
  *
  * Algorithm: DEGREE ORIENTATION (the standard scalable trick —
  * Chiba & Nishizeki '85; the compact-forward/Suri-Vassilvitskii
  * MapReduce form): each undirected edge points from its
  * lower-(degree, id) end to the higher one, making the orientation a
  * DAG where every node's out-degree is O(√m); every triangle then has
  * EXACTLY ONE wedge node holding both out-edges, so
  * wedges ⋈ oriented-edges counts each triangle once with total wedge
  * volume Σ outdeg² = O(m^1.5) — where the naive undirected wedge join
  * is Σ deg² and a single hub explodes it. A 100 TB graph's hottest
  * celebrity node generates NO wedges: all its edges point inward.
  *
  * Shape: two self-joins over the oriented edge table (persisted,
  * hash-partitioned on src — both the wedge build and the closing
  * probe reuse it), one explode + integer groupBy for per-node counts.
  * Exact Longs throughout; output is (node, n_triangles) for nodes in
  * at least one triangle.
  */
object Triangles {

  /** Local clustering coefficient per node (Watts–Strogatz '98):
    * C(v) = 2·T(v)/(deg(deg−1)) — the fraction of a node's neighbor
    * pairs that are themselves linked, the density-vs-popularity
    * signal raw degree and raw triangle counts each miss alone. On
    * the exact ppm grid ((10⁶·2·T) div (deg·(deg−1)); deg < 2 → 0),
    * every node of the graph reported. `(node, deg, n_triangles,
    * coef_ppm)`. */
  def clusteringCoef(pairs: DataFrame, a: Column, b: Column): DataFrame = {
    val e = pairs.select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tri = countPerNode(e, col("u"), col("v"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("coef_ppm",
        expr("""CASE WHEN deg >= 2L
                THEN (1000000L * 2L * n_triangles) div (deg * (deg - 1L))
                ELSE 0L END"""))
  }

  /** Degree assortativity (Newman '02): the Pearson correlation of
    * endpoint degrees over all DIRECTED edge stubs — positive on
    * social-style graphs (hubs prefer hubs), negative on
    * hub-and-spoke/web graphs. Exact Long moment sums (symmetrization
    * makes Σx = Σy and Σx² = Σy² by construction — emitted so the
    * oracle gate proves it), r via the shared
    * [[IntStats.corrFromSums]] expression order. One row. */
  def degreeAssortativity(pairs: DataFrame, a: Column,
                          b: Column): DataFrame = {
    val e = pairs.select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val directed = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val stubs = directed
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    stubs.agg(count(lit(1)).as("n"),
        sum("du").as("sx"), sum("dv").as("sy"),
        sum(col("du") * col("dv")).as("sxy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"))
      .withColumn("r", IntStats.corrFromSums(col("n"), col("sx"),
        col("sy"), col("sxy"), col("sxx"), col("syy")))
  }

  /** Incremental triangle maintenance: counts over base ∪ delta
    * touching only the delta edges' neighborhoods — O(|delta|·d̄)
    * instead of O(m^1.5), the daily-ingest shape (a day's new edges
    * against a 100 TB graph must not recount the world). Every
    * triangle containing ≥ 1 delta edge is found from each of its
    * delta edges and attributed ONCE to its lexicographically
    * smallest delta edge (2- and 3-delta-edge triangles would
    * otherwise double/triple count); base-duplicate delta edges are
    * dropped first. The correctness gate is definitional: the merged
    * counts must equal [[countPerNode]] over the union — q211
    * hash-gates exactly that.
    *
    * `(node, n_triangles)` over base ∪ delta. */
  def countPerNodeIncremental(basePairs: DataFrame, ba: Column, bb: Column,
                              deltaPairs: DataFrame, da: Column,
                              db: Column): DataFrame = {
    def canon(df: DataFrame, x: Column, y: Column) =
      df.select(least(x, y).cast("long").as("u"),
          greatest(x, y).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    val eb = canon(basePairs, ba, bb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ed = canon(deltaPairs, da, db).join(eb, Seq("u", "v"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = eb.union(ed)
    // symmetric adjacency of the union, flagged: is the edge delta?
    val adj = all.join(ed.withColumn("_d", lit(true)), Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("_d"), lit(false)).as("d"))
    val sym = adj.select(col("u").as("x"), col("v").as("y"), col("d"))
      .union(adj.select(col("v").as("x"), col("u").as("y"), col("d")))
      .repartition(col("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // for each delta edge (u,v): common neighbors w via two probes of
    // the symmetric adjacency — volume O(|delta| · avg degree)
    val viaU = ed.join(sym.select(col("x").as("u"), col("y").as("w"),
      col("d").as("dw_u")), Seq("u"))
    val closed = viaU.join(sym.select(col("x").as("v"), col("y").as("w"),
        col("d").as("dw_v")), Seq("v", "w"))
      .filter(col("w") =!= col("u") && col("w") =!= col("v"))
    // attribute once: (u,v) must be the smallest delta edge of the
    // triangle — any delta side edge that sorts before it claims it
    def edgeKey(x: Column, y: Column) = struct(least(x, y), greatest(x, y))
    val mine = closed.filter(
      (!col("dw_u") || edgeKey(col("u"), col("w")) > edgeKey(col("u"), col("v"))) &&
      (!col("dw_v") || edgeKey(col("v"), col("w")) > edgeKey(col("u"), col("v"))))
    val deltaCounts = mine
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("dt"))
    val baseCounts = countPerNode(eb, col("u"), col("v"))
    val out = baseCounts.withColumnRenamed("n_triangles", "bt")
      .join(deltaCounts, Seq("node"), "full_outer")
      .select(col("node"),
        (coalesce(col("bt"), lit(0L)) + coalesce(col("dt"), lit(0L)))
          .as("n_triangles"))
      .filter(col("n_triangles") > 0L)
      .localCheckpoint(true)
    eb.unpersist(); ed.unpersist(); sym.unpersist()
    out
  }

  /** `(node, n_triangles)` over the undirected distinct edges in
    * `pairs` (any orientation, dups/self-loops dropped). */
  def countPerNode(pairs: DataFrame, a: Column, b: Column): DataFrame = {
    val e = pairs.select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id) ascending — ties broken by id, so the
    // orientation is total and deterministic
    val withDeg = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    val o = withDeg.select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("src"), col("v").as("dst"),
            col("dv").as("ddst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"),
            col("du").as("ddst"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.ddst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at the lowest-rank corner: two out-edges, dsts ordered by
    // the same (deg, id) rank so each unordered dst pair appears once
    val e1 = o.select(col("src"), col("dst").as("w1"), col("ddst").as("d1"))
    val e2 = o.select(col("src"), col("dst").as("w2"), col("ddst").as("d2"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
    // close the wedge: the third edge is oriented w1 -> w2 by
    // transitivity of the rank order
    val tri = wedges.join(o.select(col("src").as("w1"), col("dst").as("w2")),
      Seq("w1", "w2"))
    val counts = tri
      .select(explode(array(col("src"), col("w1"), col("w2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    // node-bounded result; eager-checkpoint then release the edge cache
    // (the MinHashLsh lifecycle — nothing lingers in the CacheManager)
    val out = counts.localCheckpoint(true)
    o.unpersist()
    out
  }
}
