package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the higher-order-function dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotQ]] expression (in `hofParity` mode),
  * so a user who writes the natural declarative form gets the tight
  * primitive loop the engine ships instead of the interpreted HOF path
  * (lambda closure per element, intermediate array per row, whole-stage
  * codegen broken — measured ~6× on the similarity hot loop, see DotQ's
  * scaladoc).
  *
  * The rewrite is RESULT-IDENTICAL on every input, not just well-formed
  * ones: `DotQ(hofParity = true)` reproduces the idiom's null semantics
  * exactly — a null ELEMENT poisons the sum to null (Multiply/Add null
  * propagation through the fold) and a LENGTH MISMATCH yields null
  * (zip_with pads the shorter side with nulls). Structural requirements:
  * the zip lambda multiplies exactly its two variables, the merge lambda
  * adds exactly its two, the zero is literal 0L, the finish lambda is
  * identity (the 3-arg `aggregate` default), and both inputs are
  * array<bigint>.
  *
  * Registered via `injectOptimizerRule` in [[graft.GraftExtensions]]
  * (runs in the user-provided-optimizers batch, post-analysis, so all
  * lambda variables are resolved).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** The binary op combines exactly the lambda's two variables (either
    * order). */
  private def combinesVars(l: Expression, r: Expression,
                           args: Seq[NamedLambdaVariable]): Boolean =
    args.length == 2 && {
      val ids = Set(args(0).exprId, args(1).exprId)
      (l, r) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          Set(lv.exprId, rv.exprId) == ids
        case _ => false
      }
    }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zipArgs, _)),
          Literal(0L, LongType),
          LambdaFunction(Add(accL, accR, _), mergeArgs, _),
          finish: LambdaFunction)
        if isLongArray(a) && isLongArray(b) &&
          combinesVars(x, y, zipArgs.collect { case v: NamedLambdaVariable => v }) &&
          combinesVars(accL, accR, mergeArgs.collect { case v: NamedLambdaVariable => v }) &&
          isIdentity(finish) =>
        DotQ(a, b, hofParity = true)
    }
}
