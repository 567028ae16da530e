package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.GaSchemas

/** Enhanced-ecommerce unpivot (A6 + J1) — one row per (hit, product).
  *
  * The reference (functions/sessionization/main.py:757-806) does this with
  * an RDD flatMap over 140 columns, a driver-side `collect()` for index
  * discovery, and a left-outer self-join back on message_id. All of that
  * collapses into a single Generator expression:
  *
  *   explode_outer(filter(array(struct(pr0...), ..., struct(pr19...)), present))
  *
  * — no shuffle, no join, no driver round-trip; hits without products keep
  * exactly one row with null product columns (left-outer semantics of
  * explode_outer). Index discovery (A4, main.py:758-762) is compile-time
  * constant because the schema is static.
  *
  * Divergences from the reference, both deliberate:
  *  - product brand `br` is carried through as `prbr` (the reference's
  *    flatMap silently drops it, main.py:794-800 vs :247);
  *  - a product slot with ONLY `br` set counts as present (the reference's
  *    presence test ignores br).
  */
object Ecommerce {

  /** Output column per product attribute: id→prid, nm→prnm, br→prbr, ... */
  val outCols: Seq[String] = GaSchemas.productAttrs.map("pr" + _)

  def productStruct(i: Int): Column =
    struct(GaSchemas.productAttrs.map(a => col(s"body_pr$i$a").as("pr" + a)): _*)

  /** Adds the 8 `pr*` columns by exploding the populated product slots;
    * hits with no products keep one row with nulls. */
  def explodeProducts(df: DataFrame): DataFrame = {
    val slots = array((0 until GaSchemas.ProductSlots).map(productStruct): _*)
    val present = filter(slots,
      p => GaSchemas.productAttrs.map(a => p.getField("pr" + a).isNotNull).reduce(_ || _))
    val exploded = df.withColumn("_product", explode_outer(present))
    // one withColumns batch — a per-column withColumn fold re-analyzes the
    // ~280-col plan 8 times over
    exploded.withColumns(
      outCols.map(c => c -> col(s"_product.$c")).toMap
    ).drop("_product")
  }
}
