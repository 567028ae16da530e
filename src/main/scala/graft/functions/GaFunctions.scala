package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GA360 scalar mappings — the reference's small per-row Python UDFs,
  * re-expressed as codegen-friendly `when` cascades (no UDFs).
  */
object GaFunctions {

  /** F1 — `body_t` → GA360 hit-type enum
    * (reference functions/sessionization/main.py:379-404). Any other value,
    * including null, maps to UNKNOWN. */
  def hitsType(bodyT: Column): Column =
    when(bodyT === "pageview", "PAGE")
      .when(bodyT === "screenview", "APPVIEW")
      .when(bodyT === "event", "EVENT")
      .when(bodyT === "transaction", "TRANSACTION")
      .when(bodyT === "item", "ITEM")
      .when(bodyT === "social", "SOCIAL")
      .when(bodyT === "exception", "EXCEPTION")
      .when(bodyT === "timing", "TIMING")
      .otherwise("UNKNOWN")

  /** F11 — product action → GA eCommerceAction.action_type enum
    * (main.py:724-750; the if-chain, which shadows the dict). Anything
    * else, including null, → 0. Returned as string to match the
    * reference's string-typed UDF output. */
  def actionType(bodyPa: Column): Column =
    when(bodyPa === "click", 1)
      .when(bodyPa === "detail", 2)
      .when(bodyPa === "add", 3)
      .when(bodyPa === "checkout", 5)
      .when(bodyPa === "purchase", 6)
      .when(bodyPa === "refund", 7)
      .when(bodyPa === "checkout_option", 8)
      .otherwise(0)
      .cast("string")

  /** F12 — product revenue: qt * pr when the hit's action type is purchase
    * (6), else null (main.py:813-817). String in, double out. */
  def productRevenue(prqt: Column, prpr: Column, actionType: Column): Column =
    when(actionType === "6", prqt.cast("double") * prpr.cast("double"))
      .otherwise(lit(null).cast("double"))
}
