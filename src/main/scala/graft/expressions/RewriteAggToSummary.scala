package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Optimizer rule: answer a GROUP BY over a registered base table from
  * its pre-aggregated summary ([[graft.operators.Mv]]) — transparent
  * materialized-view rewrite, the third injected rule next to
  * [[RewriteDotProduct]] and [[RewriteRangeJoin]].
  *
  * Pattern — an Aggregate whose child is the base-table scan (optionally
  * under a Filter), where:
  *  - every grouping expression is a plain column of the MV's grouping
  *    set (a SUBSET is fine — the summary re-aggregates, the q189
  *    rollup-cascade identity);
  *  - the optional Filter references grouping columns only (a predicate
  *    on a non-grouping column would need base rows the summary has
  *    already collapsed);
  *  - every aggregate is `sum(v)` / `min(v)` / `max(v)` over an MV value
  *    column, or `count(*)`/`count(1)` — no DISTINCT, no FILTER clause,
  *    and no decimal sums (their result precision depends on the input
  *    type, which the stored partial has already widened).
  *
  * Rewrite: the scan is replaced by the summary relation and each
  * aggregate by its re-aggregable form — `sum(v)` → `sum(mv_sum_v)`,
  * `min(v)` → `min(mv_min_v)`, `max(v)` → `max(mv_max_v)`,
  * `count(*)` → `coalesce(sum(mv_cnt), 0)` — under the ORIGINAL aliases
  * and exprIds,
  * so parent operators resolve unchanged and the output schema is
  * bit-identical to the base-table plan (the q228 gate hashes it against
  * the raw-table oracle). At warehouse scale this turns a fact-table
  * scan into a scan of |grouping domain| rows.
  *
  * Scoped deliberately: fires only for registered (base, summary) pairs
  * in the session conf, matches v1 parquet relations by root path, and
  * leaves any shape it cannot PROVE answerable untouched. Excludable via
  * `spark.sql.optimizer.excludedRules` like any rule. */
class RewriteAggToSummary(session: SparkSession) extends Rule[LogicalPlan] {

  private case class Spec(base: String, summary: String,
                          group: Set[String], values: Set[String])

  private def specs: Seq[Spec] =
    conf.getAllConfs.toSeq.collect {
      case (k, v) if k.startsWith(graft.operators.Mv.ConfPrefix) =>
        v.split('|') match {
          case Array(b, s, g, vs) =>
            Some(Spec(norm(b), s, g.split(',').toSet, vs.split(',').toSet))
          case _ => None
        }
    }.flatten

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  private def scanPaths(r: LogicalRelation): Seq[String] = r.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(p => norm(p.toString))
    case _ => Nil
  }

  /** The base-table scan under the aggregate, if the whole child tree is
    * answerable from grouping columns: (relation, optional conjunction of
    * every Filter on the way down). Column-pruning projections (plain
    * attributes only) are transparent; the optimizer interleaves them
    * with Filters freely, so both recurse. */
  private def matchChild(plan: LogicalPlan): Option[(LogicalRelation, Option[Expression])] =
    plan match {
      case r: LogicalRelation => Some((r, None))
      case Filter(cond, child) =>
        matchChild(child).map { case (r, f) =>
          (r, Some(f.map(And(_, cond)).getOrElse(cond)))
        }
      case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        matchChild(child)
      case _ => None
    }

  private def attrNames(e: Expression): Seq[String] =
    e.collect { case a: AttributeReference => a.name }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ss = specs
    if (ss.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, _, child, _) =>
        val rewritten = for {
          (rel, filterOpt) <- matchChild(child)
          spec <- ss.find(s => scanPaths(rel).exists(_ == s.base))
          if groupExprs.forall {
            case a: AttributeReference => spec.group.contains(a.name)
            case _ => false
          }
          if filterOpt.forall(f => attrNames(f).forall(spec.group.contains) &&
            f.deterministic && !SubqueryExpression.hasSubquery(f))
          out <- rewriteAgg(agg, spec, filterOpt)
        } yield out
        rewritten.getOrElse(agg)
    }
  }

  private def rewriteAgg(agg: Aggregate, spec: Spec,
                         filterOpt: Option[Expression]): Option[LogicalPlan] = {
    val summary = session.read.parquet(spec.summary).queryExecution.analyzed
    val sumAttr: Map[String, AttributeReference] =
      summary.output.collect { case a: AttributeReference => a.name -> a }.toMap
    // every needed partial must exist in the summary schema
    def get(n: String): Option[AttributeReference] = sumAttr.get(n)

    def mapAggFn(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(a: AttributeReference, ansi) if spec.values.contains(a.name) &&
        !a.dataType.isInstanceOf[DecimalType] =>
        get(s"mv_sum_${a.name}").map(Sum(_, ansi).toAggregateExpression())
      case Min(a: AttributeReference) if spec.values.contains(a.name) =>
        get(s"mv_min_${a.name}").map(Min(_).toAggregateExpression())
      case Max(a: AttributeReference) if spec.values.contains(a.name) =>
        get(s"mv_max_${a.name}").map(Max(_).toAggregateExpression())
      // count(*) is non-nullable and returns 0 on empty input (the global
      // no-group case, or a filter matching no summary rows), while a bare
      // sum(mv_cnt) is nullable and returns NULL there — coalesce restores
      // both the value semantics and the bit-identical output nullability
      case Count(Seq(Literal(_, _))) =>
        get("mv_cnt").map(c =>
          Coalesce(Seq(Sum(c).toAggregateExpression(), Literal(0L))))
      case _ => None
    }

    val newAggExprs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      // grouping-column passthrough: keep the original exprId so parents
      // still resolve; the value now comes from the summary attribute
      case a: AttributeReference if spec.group.contains(a.name) =>
        get(a.name).map(sa => Alias(sa, a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, _) if spec.group.contains(a.name) =>
        get(a.name).map(sa => Alias(sa, al.name)(exprId = al.exprId))
      case al @ Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
        mapAggFn(ae.aggregateFunction).map(e =>
          Alias(e, al.name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None

    val newGroup = agg.groupingExpressions.flatMap {
      case a: AttributeReference => get(a.name)
      case _ => None
    }
    if (newGroup.length != agg.groupingExpressions.length) return None

    val newFilter = filterOpt.map { f =>
      f.transform { case a: AttributeReference => sumAttr(a.name) }
    }
    // a count(*) mapped to sum(mv_cnt) changes nothing else: grouping
    // domain, aliases, and exprIds are preserved, so output attributes
    // are identical to the original aggregate's
    val child = newFilter.map(Filter(_, summary)).getOrElse(summary)
    Some(Aggregate(newGroup, newAggExprs.map(_.get), child, agg.hint))
  }
}
