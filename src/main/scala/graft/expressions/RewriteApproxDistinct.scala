package graft.expressions

import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** OPT-IN semantics-relaxing rewrite: `COUNT(DISTINCT x)` →
  * `approx_count_distinct(x)` (HyperLogLog++, default 5% relative SD)
  * when the session explicitly declares the trade with
  * `spark.graft.approx.countdistinct = true`.
  *
  * Why a rule and not "just call the function": BI layers and shared
  * views emit `COUNT(DISTINCT …)` textually; at warehouse scale the
  * exact form costs a per-group Expand + wide shuffle of every distinct
  * value, while the sketch is one fixed-width buffer per group. Engines
  * with approximation knobs (BigQuery's `APPROX_COUNT_DISTINCT`
  * rewrites, Snowflake's session flag) make this a QUERY-UNCHANGED
  * session decision; this rule gives Spark the same lever — and unlike
  * every other graft rule it is deliberately NOT result-identical, which
  * is why it defaults off and keys on an explicit conf.
  *
  * Scope is intentionally narrow (anything else is left untouched):
  *  - single-argument COUNT(DISTINCT x) only — multi-argument distinct
  *    counts tuples, which the sketch does not model;
  *  - no FILTER clause (the sketch replacement would have to re-prove
  *    filter semantics);
  *  - the AggregateExpression keeps its resultId, so references above
  *    the aggregate (sorts, havings, projections) rebind unchanged. */
object RewriteApproxDistinct extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approx.countdistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").equalsIgnoreCase("true")) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(children), _, true, None, _)
              if children.size == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(children.head),
              isDistinct = false)
        }
    }
}
