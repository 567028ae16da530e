package graft

import org.apache.spark.sql.functions._
import graft.llm.{DedupClusters, MinHashLsh}

class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("components labels every member with the component minimum") {
    // two components: {1,2,3} (a chain — needs propagation across 2 hops)
    // and {7,9}; 5 is untouched (absent from pairs, absent from output)
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("doc_a", "doc_b")
    val comp = DedupClusters.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("long chain converges to a single component") {
    // path graph 0-1-2-...-19: worst-case diameter for min propagation
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = DedupClusters.components(pairs).as[(Long, Long)].collect()
    assert(comp.length == 20 && comp.forall(_._2 == 0L))
  }

  test("survivors keep unpaired docs and exactly one doc per cluster") {
    val docs = (1L to 10L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 4L), (6L, 7L)).toDF("doc_a", "doc_b")
    val kept = DedupClusters.survivors(docs, col("doc_id"), pairs)
      .select("doc_id").as[Long].collect().toSet
    // {1,2,4} -> keep 1; {6,7} -> keep 6; rest untouched
    assert(kept == Set(1L, 3L, 5L, 6L, 8L, 9L, 10L))
  }

  test("leakage-safe split: cluster members share a split; loners get the per-doc split") {
    import graft.llm.Splits
    val docs = (1L to 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 4L), (6L, 7L), (150L, 151L))
      .toDF("doc_a", "doc_b")
    val split = DedupClusters.components(pairs)
      .select(col("doc_id"), col("cluster_id"))
      .join(docs, Seq("doc_id"), "right")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("split_key"),
        Splits.split(col("split_key")).as("split"))
      .as[(Long, Long, String)].collect()
    val byDoc = split.map(t => t._1 -> (t._2, t._3)).toMap
    // near-dup cluster {1,2,4} shares key 1 and thus ONE split; {6,7} and
    // {150,151} likewise — no member of a cluster can cross the boundary
    assert(Set(1L, 2L, 4L).map(byDoc(_)).size == 1)
    assert(Set(6L, 7L).map(byDoc(_)).size == 1)
    assert(Set(150L, 151L).map(byDoc(_)).size == 1)
    // unclustered docs carry their own id and exactly the q43 assignment
    val lone = docs.filter(!col("doc_id").isin(1L, 2L, 4L, 6L, 7L, 150L, 151L))
      .select(col("doc_id"), Splits.split(col("doc_id")).as("want"))
      .as[(Long, String)].collect()
    lone.foreach { case (id, want) =>
      assert(byDoc(id) == ((id, want)), s"doc $id")
    }
    // all 200 docs present exactly once
    assert(split.length == 200 && split.map(_._1).distinct.length == 200)
  }

  test("end-to-end: minhash pairs over testdata form consistent clusters") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val pairs = MinHashLsh.verifiedPairs(docs, col("doc_id"), col("text"), 0.8)
    val comp = DedupClusters.components(pairs).as[(Long, Long)].collect()
    val byCluster = comp.groupBy(_._2)
    // every cluster id is a member of its own cluster and is the minimum
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
    }
    // every paired doc is in some cluster
    val paired = pairs.select("doc_a").union(pairs.select("doc_b"))
      .as[Long].collect().toSet
    assert(comp.map(_._1).toSet == paired)
  }
}
