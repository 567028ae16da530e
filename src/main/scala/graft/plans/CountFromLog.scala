package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.{Manifest, ManifestFileIndex}

/** COUNT answered FROM THE COMMIT LOG through a plain `spark.sql` /
  * `Dataset.count()` — the optimizer face of [[Manifest.countRows]]:
  * a global `count(*)` (optionally under partition-column filters)
  * over a manifest-backed table collapses to a [[LocalRelation]] whose
  * value is the sum of the pinned version's per-file row counts from
  * the `stats-<v>` sidecar. Zero data-file IO, zero tasks — the same
  * trick every table format's metadata-only count plays (Delta's
  * OPTIMIZE METADATA query, Iceberg's snapshot summary), expressed as
  * a Catalyst rule so the caller never learns a library call. Before
  * this, zero-IO counts existed but only behind
  * `Manifest.countRows(...)` — the exact serving-layer split
  * (library-call-or-miss) the unified read path was built to close.
  *
  * A rewrite fires only when it is provably exact:
  *  - the aggregate is GLOBAL (no grouping) and every output is a bare
  *    `count(<non-null literal>)` — undistincted, unfiltered. Any
  *    other aggregate, `count(col)` (null-sensitive), or a grouped
  *    count leaves the plan untouched;
  *  - the child is the manifest relation under any chain of
  *    deterministic Projects (1:1, cannot change cardinality) and
  *    Filters whose conjuncts are deterministic, subquery-free, and
  *    reference PARTITION columns only — those prune exactly through
  *    the file index's own partition evaluation, so surviving-file
  *    row counts ARE the filtered count. A predicate touching any
  *    data column disables the rewrite (row-level truth needs a scan);
  *  - the stats sidecar exists for the PINNED snapshot version and
  *    covers every surviving file. Absent or partial stats decline the
  *    rewrite — fail-safe to a normal scan, never to a wrong count
  *    (the [[graft.sources.GraftTable]] fail-open discipline).
  *
  * Scale shape: the decision reads the O(files) sidecar once at plan
  * time; at 100 TB a daily `SELECT count(*) WHERE day = X` freshness
  * probe costs one text read instead of opening every footer under
  * the partition. Reference analog: the Glue catalog's row-count
  * table properties Athena consults before scanning
  * (`cloudformation/collector-ga.yaml:605-635`).
  */
case class CountFromLog(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if isCountOnly(aggExprs) =>
      countFromLog(child) match {
        case Some(cnt) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(aggExprs.map(_ => cnt))))
        case None => agg
      }
  }

  /** Every output expression is `Alias(count(<non-null literal>))`. */
  private def isCountOnly(aggExprs: Seq[Expression]): Boolean =
    aggExprs.nonEmpty && aggExprs.forall {
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
          case Count(Seq(l: Literal)) => l.value != null
          case _ => false
        })
      case _ => false
    }

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[PlanExpression[_]])

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Descend Project/Filter chains to the manifest relation, keeping
    * filter conjuncts; None when anything on the way (or a conjunct on
    * a data column) makes file-level counting unsound. */
  private def countFromLog(plan: LogicalPlan): Option[Long] = {
    def descend(p: LogicalPlan, conds: Seq[Expression])
        : Option[(ManifestFileIndex, Seq[Expression])] = p match {
      case Project(projList, c) if projList.forall(_.deterministic) =>
        descend(c, conds)
      case Filter(cond, c) if cond.deterministic && !hasSubquery(cond) =>
        descend(c, conds ++ splitConjuncts(cond))
      case LogicalRelation(fsRel: HadoopFsRelation, _, _, _, _) =>
        fsRel.location match {
          case m: ManifestFileIndex =>
            val resolver = spark.sessionState.analyzer.resolver
            val partCols = fsRel.partitionSchema.fieldNames
            val partitionOnly = conds.forall(c =>
              c.references.forall(a => partCols.exists(resolver(a.name, _))))
            if (partitionOnly) Some((m, conds)) else None
          case _ => None
        }
      case _ => None
    }
    descend(plan, Nil).flatMap { case (m, conds) =>
      Manifest.readStatsMap(spark, m.root.toString, m.version).flatMap { stats =>
        val rootUri = m.root.toUri.getPath
        val survivors = m.listFiles(conds, Nil).flatMap(_.files).map { f =>
          f.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
        }
        // every surviving file must be covered, or the count is a guess
        if (survivors.forall(stats.contains)) Some(survivors.map(stats).sum)
        else None
      }
    }
  }
}
