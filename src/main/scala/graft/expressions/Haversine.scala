package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Great-circle distance in meters as a NATIVE codegen'd expression —
  * bit-identical to the column-composed
  * [[graft.functions.GeoFunctions.haversineM]] (same `Math.toRadians`,
  * same explicit x·x squares, same (cos·cos)·sin² association, same
  * 2·R_QUERY = 12742000.0 scale), verified on random inputs in
  * HaversineSpec. Registered as `graft_haversine_m`.
  *
  * The point of the native form is not speed (the composed column is
  * already codegen'd) but OPTIMIZABILITY: a radius predicate over a
  * single recognizable node is something a rule can rewrite; the same
  * predicate smeared across nine trig nodes is not. See
  * [[RewriteRadiusPredicate]]. */
case class HaversineM(lon1: Expression, lat1: Expression,
                      lon2: Expression, lat2: Expression)
  extends QuaternaryExpression with ExpectsInputTypes {

  override def first: Expression = lon1
  override def second: Expression = lat1
  override def third: Expression = lon2
  override def fourth: Expression = lat2

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_haversine_m"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineM.compute(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.expressions.HaversineM.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineM =
    copy(lon1 = newFirst, lat1 = newSecond, lon2 = newThird, lat2 = newFourth)
}

object HaversineM {
  /** 2 · R_QUERY_M (GeoFunctions.R_QUERY_M = 6371000.0). */
  val TwoR: Double = 12742000.0

  def compute(lo1: Double, la1: Double, lo2: Double, la2: Double): Double = {
    val rlat1 = Math.toRadians(la1)
    val rlat2 = Math.toRadians(la2)
    val dLat = rlat2 - rlat1
    val dLon = Math.toRadians(lo2) - Math.toRadians(lo1)
    val sLat = Math.sin(dLat / 2)
    val sLon = Math.sin(dLon / 2)
    // association pinned to the oracle mirror (Derive.Sql.havM):
    // ((cos·cos)·sin)·sin — double multiplication is NOT associative, and
    // this expression is the one whose RAW value crosses the engine
    // boundary (the composed GeoFunctions form only ever ships round(·,6))
    val a = sLat * sLat + Math.cos(rlat1) * Math.cos(rlat2) * sLon * sLon
    TwoR * Math.asin(Math.sqrt(a))
  }
}

/** Optimizer rule: a radius predicate `graft_haversine_m(lon, lat, LON0,
  * LAT0) <= R` (either operand order of data/center, `<`/`<=`, center and
  * radius foldable) gains a PROVABLY-CONTAINING bounding-box conjunction
  *
  *   lat BETWEEN lat0 ± dLat  AND  lon BETWEEN lon0 ± dLon
  *
  * on the SAME lat/lon child expressions — four plain comparisons against
  * double literals, which Spark's own pushdown then drives into the
  * parquet scan (PushedFilters → row-group stats pruning), while the
  * original exact predicate stays as the residual. A 100 TB point table
  * filtered to a 2 km disk stops reading the other hemisphere.
  *
  * Containment proof (haversine on a sphere of radius R):
  *   d ≥ R·|Δφ|                                  → |Δlat°| ≤ (r/R)·180/π
  *   d ≥ (2/π)·R·cos(φmax)·|Δλ|                  → |Δlon°| ≤ dLat°·(π/2)/cos(φmax)
  * with φmax = |lat0| + dLat°; both bounds are inflated by
  * 1e-6 relative + 1e-9 absolute slack so float evaluation can never
  * exclude a boundary point the exact predicate accepts. The lon
  * conjuncts are containing ONLY when the disk stays away from both the
  * poles and the antimeridian, so they are emitted only when all three
  * hold: (a) φmax < 89.99° — a disk that approaches or contains a pole
  * spans every longitude near it, and the clamped cos(φmax) would
  * under-size dLon (a point on the far side of the pole is close by
  * haversine but ~180° away in raw lon); (b) the window is narrower
  * than a hemisphere (dLon < 180°); (c) lon0 ± dLon stays inside
  * [−180°, 180°] — the haversine is periodic in Δλ but `lon BETWEEN`
  * is not, so a window crossing the antimeridian would silently drop
  * matching rows on the wrapped side (a wrapped OR-of-two-ranges is
  * possible but not worth the plan complexity; the lat conjuncts alone
  * are still containing and still prune). Rows
  * with null lat/lon are dropped by BOTH forms (null comparison ≡ null
  * haversine ≤ r ≡ filtered), so the rewrite is result-identical.
  *
  * Idempotent (conjuncts already present are not re-added); excludable
  * via spark.sql.optimizer.excludedRules. */
object RewriteRadiusPredicate extends Rule[LogicalPlan] with PredicateHelper {

  private def litD(e: Expression): Option[Double] = e match {
    case l: Literal if l.dataType == DoubleType && l.value != null =>
      Some(l.value.asInstanceOf[Double])
    case _ => None
  }

  /** (lonExpr, latExpr, lon0, lat0) with the foldable pair as center —
    * accepts the center in either argument slot. */
  private def split(h: HaversineM): Option[(Expression, Expression, Double, Double)] =
    (litD(h.lon2), litD(h.lat2), litD(h.lon1), litD(h.lat1)) match {
      case (Some(lo0), Some(la0), _, _) => Some((h.lon1, h.lat1, lo0, la0))
      case (_, _, Some(lo0), Some(la0)) => Some((h.lon2, h.lat2, lo0, la0))
      case _ => None
    }

  private def bboxPreds(h: HaversineM, r: Double): Seq[Expression] =
    split(h) match {
      case Some((lonE, latE, lon0, lat0)) if r >= 0 =>
        val dLat = (r / 6371000.0) * (180.0 / Math.PI) * 1.000001 + 1e-9
        val latPreds = Seq(
          GreaterThanOrEqual(latE, Literal(lat0 - dLat, DoubleType)),
          LessThanOrEqual(latE, Literal(lat0 + dLat, DoubleType)))
        val phiMax = math.abs(lat0) + dLat
        // lon conjuncts only when provably containing: away from the poles
        // (cos φmax valid), narrower than a hemisphere, and not crossing
        // the antimeridian (BETWEEN is not periodic; haversine is).
        val lonPreds = if (phiMax >= 89.99) Nil else {
          val dLon = dLat * (Math.PI / 2) / Math.cos(Math.toRadians(phiMax)) *
            1.000001 + 1e-9
          // inclusive at ±180: a row stored as lon = -180.0 is the dual
          // representation of +180, so a window TOUCHING the seam already
          // needs the periodic form BETWEEN cannot express
          if (dLon >= 180.0 || lon0 - dLon <= -180.0 || lon0 + dLon >= 180.0) Nil
          else Seq(
            GreaterThanOrEqual(lonE, Literal(lon0 - dLon, DoubleType)),
            LessThanOrEqual(lonE, Literal(lon0 + dLon, DoubleType)))
        }
        latPreds ++ lonPreds
      case _ => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap {
        case LessThanOrEqual(h: HaversineM, r: Literal) =>
          litD(r).toSeq.flatMap(bboxPreds(h, _))
        case LessThan(h: HaversineM, r: Literal) =>
          litD(r).toSeq.flatMap(bboxPreds(h, _))
        case GreaterThanOrEqual(r: Literal, h: HaversineM) =>
          litD(r).toSeq.flatMap(bboxPreds(h, _))
        case GreaterThan(r: Literal, h: HaversineM) =>
          litD(r).toSeq.flatMap(bboxPreds(h, _))
        case _ => Nil
      }
      val fresh = derived.filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (fresh.isEmpty) f
      else Filter(And(fresh.reduce(And), cond), child)
  }
}
