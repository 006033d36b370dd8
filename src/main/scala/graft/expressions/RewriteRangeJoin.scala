package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plan a pure range (interval) join as a bucket-expansion
  * equi-join instead of the nested loop Catalyst falls back to.
  *
  * Pattern: an INNER join whose condition is exactly the half-open pair
  *
  *   p >= lo AND p < hi        (operand orientation free; all BIGINT)
  *
  * with `p` from one side and `lo`/`hi` from the other, and NO equi
  * conjunct (with one, Spark already hash-joins and evaluates the range
  * as a residual — nothing to fix). Such a join has no join key, so Spark
  * plans BroadcastNestedLoopJoin or a cartesian product —
  * O(|points|·|intervals|) comparisons, the classic 100 TB cliff of
  * event-to-window attribution.
  *
  * Rewrite (the same shape as
  * [[graft.operators.RangeJoinOps.bucketRangeJoin]], constructed here
  * from catalyst nodes so it applies to ANY user query with the idiom):
  *
  *  - points side: project an extra `__bucket_pt = p floordiv W`;
  *  - intervals side: filter `hi > lo`, then Generate
  *    `explode(sequence(floordiv(lo), floordiv(hi-1)))` — one row per
  *    W-aligned bucket the interval overlaps;
  *  - inner-join on bucket equality AND the ORIGINAL condition (exact
  *    residual), then project back to the original output order.
  *
  * Every match is produced exactly once (in the point's own bucket), so
  * the rewrite is result-identical — including null handling: a null `p`
  * buckets to null and the equi-key rejects it, exactly as `p >= lo`
  * rejects it in the nested loop; null/empty intervals die in the
  * `hi > lo` filter. Floor-division is exact integer arithmetic
  * ((x − pmod(x, W)) div W), valid over the full bigint range, negatives
  * included.
  *
  * Off by default: fires only when `spark.graft.rangeJoin.bucketWidth`
  * is set to a positive long (the width is workload-specific — pick ≈ the
  * median interval length; replication is O(span/W) per interval).
  * Excludable like any rule via `spark.sql.optimizer.excludedRules`.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConfKey = "spark.graft.rangeJoin.bucketWidth"

  private def widthConf: Long =
    try conf.getConfString(WidthConfKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def isLong(e: Expression): Boolean = e.dataType == LongType

  /** (point, lo, hi) if the condition is exactly the half-open pattern. */
  private def matchRange(cond: Expression): Option[(Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    // normalize each conjunct to (ge: x >= y) or (lt: x < y)
    val ge = conjuncts.collectFirst {
      case GreaterThanOrEqual(x, y) => (x, y)
      case LessThanOrEqual(y, x) => (x, y)
    }
    val lt = conjuncts.collectFirst {
      case LessThan(x, y) => (x, y)
      case GreaterThan(y, x) => (x, y)
    }
    (ge, lt) match {
      case (Some((p1, lo)), Some((p2, hi)))
        if p1.semanticEquals(p2) && Seq(p1, lo, hi).forall(isLong) =>
        Some((p1, lo, hi))
      case _ => None
    }
  }

  private def floorDiv(x: Expression, w: Long): Expression = {
    val lw = Literal(w, LongType)
    IntegralDivide(Subtract(x, Pmod(x, lw)), lw)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = widthConf
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond) match {
          case Some((p, lo, hi))
            // p from one side, lo+hi from the other (either orientation)
            if (p.references.subsetOf(left.outputSet) &&
                (lo.references ++ hi.references).subsetOf(right.outputSet)) ||
              (p.references.subsetOf(right.outputSet) &&
                (lo.references ++ hi.references).subsetOf(left.outputSet)) =>
            val pFromLeft = p.references.subsetOf(left.outputSet)
            val (ptsPlan, ivsPlan) = if (pFromLeft) (left, right) else (right, left)

            val ptBucket = Alias(floorDiv(p, w), "__bucket_pt")()
            val pts = Project(ptsPlan.output :+ ptBucket, ptsPlan)

            val ivBucketAttr = AttributeReference("__bucket_iv", LongType)()
            val ivs = Generate(
              // Sequence is TimeZoneAwareExpression: without an explicit
              // zone it is UNRESOLVED and the optimizer rejects the plan
              Explode(Sequence(floorDiv(lo, w),
                floorDiv(Subtract(hi, Literal(1L, LongType)), w), None,
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(ivBucketAttr),
              child = Filter(GreaterThan(hi, lo), ivsPlan))

            val bucketEq = EqualTo(ptBucket.toAttribute, ivBucketAttr)
            val joined = Join(pts, ivs, Inner,
              Some(And(bucketEq, cond)), hint)
            // restore the original column order and drop the bucket cols
            Project(j.output, joined)
          case _ => j
        }
    }
  }
}
