package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Dump the INTERNAL subplans the round-14 optimization claims are
  * about — the loop bodies and candidate stages that the registered
  * queries hide behind eager localCheckpoints (their registered plans
  * are just checkpoint scans):
  *
  *  - `bradley_terry_round`: one MM round's terms→raw pipeline
  *    (the per-round join strategy against the persisted edge table);
  *  - `pagerank_step`: one power iteration (join strategy + sorts
  *    against the cached edge table);
  *  - `ppjoin_cand_q96`: q96's candidate join over char-5-gram sets
  *    (prefix index self-join + filters), cacheSets=false so the whole
  *    lineage is visible in one explain.
  *
  * `runMain graft.tools.InternalPlans <outDir> <suffix> [sfDir]`
  */
object InternalPlans {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.builder(master = "local[32]",
      shufflePartitions = Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[internalplans] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }

    // --- one Bradley–Terry MM round (mirrors BradleyTerry.fit's loop)
    {
      val wl = graft.SparkEntry.supplierDuels(spark, dir)
        .select(col("win").cast("long").as("w"), col("lose").cast("long").as("l"))
        .filter(col("w") =!= col("l"))
      val games = wl.select(least(col("w"), col("l")).as("a"),
          greatest(col("w"), col("l")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
      val edges = games.select(col("a").as("i"), col("b").as("j"), col("n"))
        .union(games.select(col("b").as("i"), col("a").as("j"), col("n")))
        .repartition(col("i"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count(): Unit // materialize the cache like the operator does
      val wins = wl.groupBy(col("w").as("i")).agg(count(lit(1)).as("wi"))
        .localCheckpoint(true)
      val items = edges.select("i").distinct()
      val state = items
        .crossJoin(broadcast(items.agg(count(lit(1)).as("_m"))))
        .select(col("i"), expr("1000000L div _m").as("p"))
        .localCheckpoint(true)
      val roundPlan = graft.llm.BradleyTerry.oneRoundPlan(edges, state, wins)
      dump("bradley_terry_round", roundPlan)
      edges.unpersist()
    }

    // --- one PageRank power iteration (the PlanSpec-pinned step)
    {
      val li = Tables.lineitem(spark, dir)
      val edges0 = li.select(col("l_suppkey").as("src"), col("l_orderkey").as("dst"))
      val (g, nodes) = graft.operators.PageRank.buildGraph(
        edges0, col("src"), col("dst"))
      g.count(): Unit
      val n = col("n").cast("double")
      val ranks = nodes.crossJoin(broadcast(g.select(col("n")).limit(1)))
        .select(col("node"), (lit(1.0) / n).as("rank"))
        .localCheckpoint(true)
      dump("pagerank_step", graft.operators.PageRank.step(g, ranks, 0.85))
      g.unpersist()
    }

    // --- q96's candidate stage, full lineage (cacheSets = false)
    {
      val docs = Tables.documents(spark, dir)
      val sets = docs.select(col("doc_id"),
          call_function("char_ngram_hash_set", col("text"), lit(5)).as("hs"),
          length(col("text")).cast("long").as("aux"))
        .where(size(col("hs")) > 0)
      val lenBand = (la: org.apache.spark.sql.Column,
                     lb: org.apache.spark.sql.Column) =>
        abs(la - lb).cast("double") <
          lit(0.25005) * greatest(la, lb).cast("double")
      val cand = graft.llm.MinHashLsh.jaccardJoinFromSets(sets, 1, 2,
        cacheSets = false, auxPairFilter = Some(lenBand))
      dump("ppjoin_cand_q96", cand)
    }
    spark.stop()
  }
}
