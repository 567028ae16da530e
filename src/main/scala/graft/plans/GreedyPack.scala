package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension for greedy sequence packing — the
  * (c)-tier extension point (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` via `SparkSessionExtensions`) next to the expression-tier
  * ones in `expressions/`.
  *
  * [[graft.llm.Packing.packGreedy]] expresses the same chained-state
  * pass as `repartition + sortWithinPartitions + mapPartitions`. That
  * formulation is CLOSED to the optimizer: mapPartitions is a black box
  * pinned under an explicit exchange, so even when the child is ALREADY
  * hash-partitioned by shard (an upstream aggregate, a bucketed read),
  * Spark must still pay the blind repartition. Declaring the operator
  * to the planner instead — `requiredChildDistribution =
  * ClusteredDistribution(shard)`, `requiredChildOrdering = (shard,
  * doc_id)` — hands the placement decision to EnsureRequirements, which
  * inserts the exchange/sort only when the child does not already
  * satisfy them (asserted in PlanSpec). Same two-longs-of-state scan,
  * zero shuffles of its own.
  *
  * Child contract (built by [[graft.llm.Packing.packedBase]]):
  * `(shard: long, doc_id: any-orderable, n_tokens: long)`; output
  * appends `(seq_no, offset)` with q65's exact chain semantics.
  */
case class GreedyPackPlan(budget: Long, child: LogicalPlan,
    packAttrs: Seq[Attribute] = Seq(
      AttributeReference("seq_no", LongType, nullable = false)(),
      AttributeReference("offset", LongType, nullable = false)()))
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ packAttrs
  override def producedAttributes: AttributeSet = AttributeSet(packAttrs)
  // The chain consumes (shard, doc_id, n_tokens) POSITIONALLY even when
  // the parent projects none of them (e.g. a bare count()): without
  // declared references, ColumnPruning inserts an empty Project under
  // the node and the exec's ordinal reads explode.
  override lazy val references: AttributeSet = AttributeSet(child.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): GreedyPackPlan =
    copy(child = newChild)
}

case class GreedyPackExec(budget: Long, packAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  require(child.output.length >= 3,
    s"GreedyPackExec needs (shard, doc_id, n_tokens), got ${child.output}")

  override def output: Seq[Attribute] = child.output ++ packAttrs
  override def producedAttributes: AttributeSet = AttributeSet(packAttrs)

  // The whole point: declared requirements instead of a hand-rolled
  // exchange. EnsureRequirements adds Exchange/Sort ONLY if missing.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(child.output.head)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(child.output(0), Ascending),
      SortOrder(child.output(1), Ascending)))
  // state chain preserves its input order and partitioning
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val b = budget
    val out = output
    child.execute().mapPartitions({ rows =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val extra = new Array[Any](2)
      val extraRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(extra)
      var curShard = 0L
      var started = false
      var fill = 0L
      var seq = 0L
      rows.map { r =>
        val shard = r.getLong(0)
        val nt = r.getLong(2)
        if (!started || shard != curShard) {
          started = true; curShard = shard; seq = 1L; fill = nt
        } else if (fill + nt > b) {
          seq += 1; fill = nt
        } else fill += nt
        extra(0) = seq
        extra(1) = fill - nt
        proj(joined(r, extraRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GreedyPackExec =
    copy(child = newChild)
}

/** Planner rule: injected via `ext.injectPlannerStrategy` in
  * [[graft.GraftExtensions]]. */
object GreedyPackStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GreedyPackPlan =>
      GreedyPackExec(g.budget, g.packAttrs, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

object GreedyPack {
  /** DataFrame front-end over the custom node. */
  def apply(base: DataFrame, budget: Long): DataFrame =
    org.apache.spark.sql.GraftDatasetFactory.ofRows(base.sparkSession,
      GreedyPackPlan(budget, base.queryExecution.analyzed))
}
