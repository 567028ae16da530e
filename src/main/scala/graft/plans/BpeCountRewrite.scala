package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expressions.{BpeCountExpr, BpeEncodeExpr, BpeEncodeIdsExpr}

/** Optimizer rule (the `injectOptimizerRule` extension tier, next to the
  * expression tier in `expressions/` and the whole-operator tier in
  * [[GreedyPackPlan]]): rewrite `size(bpe_encode(text))` to the native
  * `bpe_count(text)`.
  *
  * Every packing/chunking budget is a token COUNT — `q117`-style code
  * writes the readable `size(bpe_encode(text))`, which materializes one
  * UTF8String per token plus a GenericArrayData per row only to take
  * the array's length and throw it away. The rewrite keeps the caller's
  * declarative form and gives the plan the allocation-free projection —
  * exactly Catalyst's job split: the user states WHAT (a token count),
  * the optimizer picks HOW.
  *
  * Semantics-preserving by construction: [[BpeCountExpr]] carries
  * `Size`'s own `legacySizeOfNull` flag, so null texts keep returning
  * -1 (legacy) or NULL (ANSI) exactly as `size` would. Runs in the
  * extended operator-optimization batch (fixed point — the rewrite is
  * idempotent: its output contains no `Size(BpeEncodeExpr)` to match).
  */
object BpeCountRewrite extends Rule[LogicalPlan] {

  private def isEncode(e: Expression): Boolean = e match {
    case _: BpeEncodeExpr | _: BpeEncodeIdsExpr => true
    case _ => false
  }

  /** One pass over the plan's expressions: whether any `size(bpe_*)`
    * target exists at all (the fast-path gate — most plans have none
    * and must not pay a second traversal), and the canonicalized inputs
    * of every `bpe_encode`/`bpe_encode_ids` call used BARE (not
    * directly under `size`). If the token array itself is consumed next
    * to `size(...)` over the same input, rewriting the size would turn
    * ONE shared merge-loop evaluation (codegen subexpression
    * elimination) into two — a pessimization, so those inputs are left
    * alone. */
  private def scanPlan(plan: LogicalPlan): (Boolean, Set[Expression]) = {
    var hasTarget = false
    val bare = Set.newBuilder[Expression]
    def scan(e: Expression): Unit = e match {
      case Size(b, _) if isEncode(b) =>
        hasTarget = true
        b.children.foreach(scan)
      case b if isEncode(b) =>
        bare += b.children.head.canonicalized
        b.children.foreach(scan)
      case other => other.children.foreach(scan)
    }
    plan.foreach(_.expressions.foreach(scan))
    (hasTarget, bare.result())
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val (hasTarget, bare) = scanPlan(plan)
    if (!hasTarget) plan
    else plan.transformAllExpressions {
      // the id-stream case counts tokens too (one id per token), and
      // the count projection also skips the vocab lookups
      case Size(b, legacy)
          if isEncode(b) && !bare.contains(b.children.head.canonicalized) =>
        BpeCountExpr(b.children.head, legacy)
    }
  }
}
