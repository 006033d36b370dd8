package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{DotQ, RewriteDotProduct, RewriteRangeJoin, TopK}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's native expressions with the session's function
  * registry (callable from SQL and `call_function` alike) and the
  * optimizer rule that rewrites the declarative HOF dot-product idiom
  * into the native expression ([[graft.expressions.RewriteDotProduct]]),
  * so users get the codegen'd loop without knowing the engine function
  * exists. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[DotQ].getCanonicalName, "graft_dot_q"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot_q takes exactly 2 arguments")
        DotQ(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopK].getCanonicalName, "graft_top_k"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "graft_top_k takes exactly 3 arguments (key, payload, k)")
        TopK(children.head, children(1), children(2))
      }))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewriteRangeJoin)
  }
}
