package graft

import org.apache.spark.sql.functions._
import graft.llm.Shuffle

class ShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "body")

  test("epochOrder is a permutation: rows conserved, dense 1..n positions per shard") {
    val out = Shuffle.epochOrder(corpus, col("doc_id"), shards = 8, salt = "e1")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 8)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length), s"shard $shard")
    }
  }

  test("same salt is stable across runs and partitionings; new salt permutes") {
    def order(df: org.apache.spark.sql.DataFrame, salt: String) =
      Shuffle.epochOrder(df, col("doc_id"), 8, salt)
        .orderBy("shard", "pos").select("id").as[Long].collect().toSeq
    val a = order(corpus, "e1")
    assert(a == order(corpus.repartition(13), "e1"),
      "the epoch stream must not depend on input partitioning")
    val b = order(corpus, "e2")
    assert(a != b, "a new epoch salt must give a different order")
    assert(a.sorted == b.sorted, "every epoch visits every doc")
  }

  test("plan shape: one hash exchange on the shard key, window partitioned by shard") {
    val plan = Shuffle.epochOrder(corpus, col("doc_id"), 8, "e1")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly the shard exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global range sort (that's the orderBy(rand()) shape):\n$plan")
  }
}
