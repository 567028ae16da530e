package graft.plans

import org.apache.spark.sql.catalyst.expressions.Size
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expressions.{BpeCountExpr, BpeEncodeExpr}

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
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(b: BpeEncodeExpr, legacy) => BpeCountExpr(b.child, legacy)
    }
}
