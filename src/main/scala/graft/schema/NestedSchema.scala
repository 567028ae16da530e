package graft.schema

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SURVEY §1.1's "idiomatic upgrade": the BigQuery-export nested layout
  * (`trafficSource`/`geoNetwork`/`device`/`totals`/`hits.page`/
  * `hits.product`/... structs) over the reference-faithful FLAT column
  * space (`trafficSource_source`, `hits_page_pagePath`, ...).
  *
  * Pure reshaping — `toNested` folds flat columns into structs by the
  * group prefixes below (longest match wins, so `hits_page_pagePath`
  * nests as hits.page.pagePath while `hits_type` nests as hits.type);
  * `toFlat` is its inverse (field path joined with '_'): the round trip
  * preserves every column's name, type and values, with each group's
  * columns emitted contiguously (the flat export interleaves them, so
  * exact column ORDER is the one thing not preserved). Both are metadata-only
  * projections: no shuffle, no data movement beyond the row rewrite, and
  * Parquet stores the struct fields as the same leaf columns either way.
  * The reference has no such layer (it writes the flat 267/80 columns,
  * main.py:819-926); this is the Spark-native surface a Dataset user
  * would expect.
  *
  * The `hits_transation_*` (sic) reference typo is preserved as its own
  * group so the round-trip is lossless.
  */
object NestedSchema {

  /** Struct-group prefixes; a flat column `<group>_<leaf>` nests at the
    * '_'-split path of `group`. Longest prefix wins. */
  val groups: Seq[String] = Seq(
    "hits_page", "hits_eventInfo", "hits_eCommerceAction",
    "hits_transaction", "hits_transation", "hits_item", "hits_product",
    "hits", "trafficSource", "geoNetwork", "device", "totals")

  private val byLength = groups.sortBy(-_.length)

  /** Flat name → nested path (last element = leaf field name). */
  def path(flat: String): Seq[String] =
    byLength.find(g => flat.startsWith(g + "_")) match {
      case Some(g) => g.split('_').toSeq :+ flat.stripPrefix(g + "_")
      case None    => Seq(flat)
    }

  private sealed trait Node
  private final case class Leaf(flat: String) extends Node
  private final class Branch extends Node {
    val children: mutable.LinkedHashMap[String, Node] = mutable.LinkedHashMap()
  }

  /** Folds the flat columns into the nested struct layout. Field order
    * inside every struct = first-appearance order of the flat columns. */
  def toNested(df: DataFrame): DataFrame = {
    val root = new Branch
    df.columns.foreach { c =>
      val p = path(c)
      var at = root
      p.dropRight(1).foreach { seg =>
        at = at.children.getOrElseUpdate(seg, new Branch) match {
          case b: Branch => b
          case _: Leaf => throw new IllegalArgumentException(
            s"column $c nests under ${p.mkString(".")} but a scalar column " +
              "already occupies that path")
        }
      }
      if (at.children.put(p.last, Leaf(c)).isDefined)
        throw new IllegalArgumentException(s"duplicate nested path for $c")
    }
    def emit(name: String, n: Node): Column = n match {
      case Leaf(flat) => col(flat).as(name)
      case b: Branch =>
        struct(b.children.map { case (k, v) => emit(k, v) }.toSeq: _*).as(name)
    }
    df.select(root.children.map { case (k, v) => emit(k, v) }.toSeq: _*)
  }

  /** Exact inverse of [[toNested]]: every struct field flattens to its
    * path joined with '_'. (Flattens ALL struct columns — the GA tables
    * have none besides the groups above.) */
  def toFlat(df: DataFrame): DataFrame = {
    def walk(prefix: Seq[String], dt: org.apache.spark.sql.types.DataType): Seq[Column] =
      dt match {
        case s: StructType =>
          s.fields.toSeq.flatMap(f => walk(prefix :+ f.name, f.dataType))
        case _ =>
          val flat = prefix.mkString("_")
          Seq(col(prefix.mkString(".")).as(flat))
      }
    df.select(df.schema.fields.toSeq.flatMap(f =>
      walk(Seq(f.name), f.dataType)): _*)
  }
}
