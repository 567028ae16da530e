package graft

import org.apache.spark.sql.functions._
import graft.ingest.Ingest
import graft.operators.Ecommerce
import graft.functions.GaFunctions

class EcommerceSpec extends SparkTestBase {

  private lazy val hits =
    Ingest.readEnrichedHits(spark, "fixtures/ga/enriched/year=2019/month=09/day=23")

  test("multi-product purchase explodes into one row per product, brand preserved") {
    val out = Ecommerce.explodeProducts(hits)
      .filter(col("body_cid") === "cid-v01" && col("body_pa") === "purchase")
      .select("prid", "prnm", "prbr", "prpr", "prqt")
      .orderBy("prid").collect()
    assert(out.length == 2)
    assert(out(0).toSeq == Seq("SKU-1", "Road Runner", "BrandA", "59.5", "1"))
    assert(out(1).toSeq == Seq("SKU-2", "Trail Blazer", "BrandB", "40.25", "1"))
  }

  test("hits without products keep exactly one row with null product columns") {
    val pvs = Ecommerce.explodeProducts(hits.filter(col("body_t") === "pageview"))
    assert(pvs.count() == hits.filter(col("body_t") === "pageview").count())
    assert(pvs.filter(col("prid").isNotNull).count() == 0)
  }

  test("row multiplicity: explode multiplies only product hits") {
    val base = hits.count()
    val exploded = Ecommerce.explodeProducts(hits).count()
    val extraProducts = 1L // v01 purchase has 2 products -> +1 row
    assert(exploded == base + extraProducts)
  }

  test("product revenue only on purchase action (F11/F12)") {
    val out = Ecommerce.explodeProducts(hits)
      .filter(col("prid").isNotNull)
      .withColumn("action_type", GaFunctions.actionType(col("body_pa")))
      .withColumn("product_revenue",
        GaFunctions.productRevenue(col("prqt"), col("prpr"), col("action_type")))
      .filter(col("body_cid").isin("cid-v01", "cid-v02"))
      .select("prid", "action_type", "product_revenue")
      .orderBy("prid").collect()
    val bySku = out.map(r => (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(bySku.contains(("SKU-1", "6", 59.5)))
    assert(bySku.contains(("SKU-2", "6", 40.25)))
    assert(bySku.contains(("SKU-42", "2", null))) // detail view: no revenue
  }
}
