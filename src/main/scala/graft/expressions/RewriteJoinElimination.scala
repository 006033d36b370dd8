package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: eliminate a LEFT OUTER join to a dimension table
  * declared UNIQUE on its join key when nothing above the join reads the
  * dimension's columns — the classic warehouse join-elimination that
  * engines with declared (RELY) primary-key constraints perform and
  * Spark, having no constraint catalog, cannot.
  *
  * A left-outer join against a side that is unique on the equi-key
  * neither duplicates nor drops left rows; if no dimension column is
  * referenced above, the join is a no-op and the scan + shuffle/broadcast
  * it costs are pure waste. Views and BI tools generate exactly this
  * shape constantly ("SELECT fact columns FROM wide_view"): the view
  * joins every dimension, the query reads two fact columns.
  *
  * Declarations ([[graft.operators.Mv]]-style session conf):
  * `spark.graft.unique.<name> = "<parquetPath>|<keyColumn>"` asserts the
  * table at that path has at most one row per key value — the RELY
  * contract: correctness of the elimination rests on the declaration,
  * exactly as with RELY constraints in commercial warehouses.
  *
  * Pattern: Project or Aggregate over Join(left, dim, LeftOuter,
  * left.k = dim.key) where dim is (a pruning Project over) the declared
  * relation and every attribute referenced above comes from the left
  * side. Rewrite: drop the join, keep the left subtree. Fires bottom-up,
  * so chains of dimension joins unwind one per pass. */
object RewriteJoinElimination extends Rule[LogicalPlan] {

  val ConfPrefix = "spark.graft.unique."

  private def declarations: Seq[(String, String)] =
    conf.getAllConfs.toSeq.collect {
      case (k, v) if k.startsWith(ConfPrefix) =>
        v.split('|') match {
          case Array(p, key) => Some((norm(p), key))
          case _ => None
        }
    }.flatten

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  /** The declared-unique key attribute of `plan`, if it is (a pruning
    * projection over) a relation registered unique on that key. */
  private def uniqueKeyOf(plan: LogicalPlan,
                          decls: Seq[(String, String)]): Option[Attribute] =
    plan match {
      case r: LogicalRelation =>
        val paths = r.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(p => norm(p.toString))
          case _ => Nil
        }
        decls.collectFirst {
          case (p, key) if paths.contains(p) => key
        }.flatMap(key => r.output.find(_.name == key))
      case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        uniqueKeyOf(child, decls)
      case _ => None
    }

  private def eliminate(join: Join, above: AttributeSet,
                        decls: Seq[(String, String)]): Option[LogicalPlan] =
    join match {
      case Join(left, dim, LeftOuter, Some(EqualTo(a: AttributeReference, b: AttributeReference)), _)
        if above.subsetOf(left.outputSet) =>
        val (lk, dk) =
          if (left.outputSet.contains(a) && dim.outputSet.contains(b)) (a, b)
          else if (left.outputSet.contains(b) && dim.outputSet.contains(a)) (b, a)
          else return None
        val _ = lk
        uniqueKeyOf(dim, decls) match {
          case Some(key) if key.exprId == dk.exprId => Some(left)
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val decls = declarations
    if (decls.isEmpty) return plan
    plan.transformUp {
      case p @ Project(projList, j: Join) =>
        eliminate(j, AttributeSet(projList.flatMap(_.references)), decls)
          .map(Project(projList, _)).getOrElse(p)
      case a @ Aggregate(group, aggs, j: Join, hint) =>
        eliminate(j, AttributeSet((group ++ aggs).flatMap(_.references)), decls)
          .map(Aggregate(group, aggs, _, hint)).getOrElse(a)
      // NOT handled: Filter(_, Join) — a Filter's output is the JOIN's
      // full output, so operators above it could still reference dim
      // columns; only output-narrowing parents (Project, Aggregate) prove
      // the dim side unused.
    }
  }
}
