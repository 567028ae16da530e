package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    // key 1: values 10, 30, 30(tie, higher id), 20, 5
    (1L, 101L, 10.0), (1L, 102L, 30.0), (1L, 103L, 30.0),
    (1L, 104L, 20.0), (1L, 105L, 5.0),
    // key 2: fewer rows than k
    (2L, 201L, 7.0)
  ).toDF("key", "id", "v")

  test("top-k aggregate: largest-first, struct tie-break, short groups") {
    val out = TopK.topKPerKey(df, Seq(col("key")),
      struct(col("v"), col("id")), k = 3)
      .select(col("key"), col("_row.v"), col("_row.id"), col("rank"))
      .as[(Long, Double, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 30.0, 103L, 1L), // tie: larger id ranks first (lexicographic)
      (1L, 30.0, 102L, 2L),
      (1L, 20.0, 104L, 3L),
      (2L, 7.0, 201L, 1L))) // group smaller than k: all rows, no padding
  }

  test("smallest-first variant") {
    val out = TopK.topKPerKey(df, Seq(col("key")),
      struct(col("v"), col("id")), k = 2, largest = false)
      .select(col("_row.id"), col("rank")).as[(Long, Long)].collect().toSet
    assert(out == Set((105L, 1L), (101L, 2L), (201L, 1L)))
  }

  test("the plan is an aggregate with map-side partials, not a window") {
    val plan = TopK.topKPerKey(df, Seq(col("key")),
      struct(col("v"), col("id")), 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate:\n$plan")
    assert(plan.toLowerCase.contains("partial_collect_top_k"),
      s"no partial (map-side) aggregation:\n$plan")
  }
}
