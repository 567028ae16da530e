package graft

import org.apache.spark.sql.functions._
import graft.plans.JoinElimination

class JoinEliminationSpec extends SparkTestBase {
  import spark.implicits._

  private val factPath = s"$sf/orders.parquet"
  private val dimPath = s"$sf/customer.parquet"
  private lazy val orders = spark.read.parquet(factPath)
  private lazy val customer = spark.read.parquet(dimPath)

  private def withConstraint[T](body: => T): T =
    try { JoinElimination.register(spark, factPath, "o_custkey",
      dimPath, "c_custkey"); body }
    finally JoinElimination.clear()

  test("eliminates an unconsumed dim join; results identical to the joined plan") {
    val q = () => orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select(orders("o_orderkey"), customer("c_custkey"),
        orders("o_orderpriority"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("nc"))
    JoinElimination.clear()
    val joined = q().as[(String, Long, Long)].collect().sortBy(_._1)
    assert(!JoinElimination.joinFree(q()), "without a constraint the join stays")
    withConstraint {
      val out = q()
      assert(JoinElimination.joinFree(out), "join must be eliminated")
      assert(out.as[(String, Long, Long)].collect().sortBy(_._1)
        .sameElements(joined), "identical results")
    }
  }

  test("fact-side filters keep eliminating; dim column use or dim filter keeps the join") {
    withConstraint {
      val filteredFact = orders.filter(col("o_totalprice") > 1000.0)
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .select(orders("o_orderkey"))
      assert(JoinElimination.joinFree(filteredFact),
        "a fact filter preserves the constraint")

      val usesDim = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))
        .select(orders("o_orderkey"), customer("c_name"))
      assert(!JoinElimination.joinFree(usesDim),
        "consuming a dim column keeps the join")

      val dimFiltered = orders.join(
          customer.filter(col("c_nationkey") === 3),
          orders("o_custkey") === customer("c_custkey"))
        .select(orders("o_orderkey"))
      assert(!JoinElimination.joinFree(dimFiltered),
        "a dim filter does real work — join stays")

      val outer = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"), "left")
        .select(orders("o_orderkey"))
      assert(!JoinElimination.joinFree(outer), "only inner joins eliminate")
    }
  }

  test("reversed join order eliminates too") {
    withConstraint {
      val out = customer.join(orders,
          customer("c_custkey") === orders("o_custkey"))
        .select(orders("o_orderkey"), orders("o_totalprice"))
      assert(JoinElimination.joinFree(out))
      assert(out.count() == orders.count(), "row-preserving")
    }
  }

  test("data change after registration declines the elimination " +
    "(staleness fingerprint)") {
    val fDir = java.nio.file.Files.createTempDirectory("graft_jefact").toString
    val dDir = java.nio.file.Files.createTempDirectory("graft_jedim").toString
    try {
      orders.limit(100).write.mode("overwrite").parquet(fDir)
      // dim must cover the fact's fks — keep all customers
      customer.write.mode("overwrite").parquet(dDir)
      JoinElimination.register(spark, fDir, "o_custkey", dDir, "c_custkey")
      def q = {
        val f = spark.read.parquet(fDir); val d = spark.read.parquet(dDir)
        f.join(d, f("o_custkey") === d("c_custkey"))
          .select(f("o_orderpriority"), d("c_custkey"))
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      }
      assert(JoinElimination.joinFree(q), "fresh registration eliminates")
      // append a fact row with an ORPHAN fk: the validated constraint no
      // longer holds — the join must run for real (and drop the orphan)
      val total = q.collect().map(_.getLong(1)).sum
      orders.limit(1)
        .withColumn("o_custkey", lit(-1L).cast(orders.schema("o_custkey").dataType))
        .write.mode("append").parquet(fDir)
      val after = q
      assert(!JoinElimination.joinFree(after),
        "stale constraint must not eliminate")
      assert(after.collect().map(_.getLong(1)).sum == total,
        "the real join drops the orphan row")
    } finally {
      JoinElimination.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dDir))
    }
  }

  test("validation rejects a non-unique pk and an orphaned fk") {
    val dupDim = s"${System.getProperty("java.io.tmpdir")}/graft_je_dup"
    customer.unionAll(customer.limit(5)).write.mode("overwrite").parquet(dupDim)
    intercept[IllegalArgumentException] {
      JoinElimination.register(spark, factPath, "o_custkey", dupDim, "c_custkey")
    }
    val thinDim = s"${System.getProperty("java.io.tmpdir")}/graft_je_thin"
    customer.filter(col("c_custkey") % 2 === 0)
      .write.mode("overwrite").parquet(thinDim)
    intercept[IllegalArgumentException] {
      JoinElimination.register(spark, factPath, "o_custkey", thinDim, "c_custkey")
    }
    JoinElimination.clear()
  }
}
