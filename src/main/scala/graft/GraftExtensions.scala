package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.DotQ

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's native expressions with the session's function
  * registry, so they are callable from SQL and `call_function` alike.
  * This is the sanctioned place to grow custom `Rule`s / strategies if a
  * future operator needs one — so far none does (SURVEY §4: Catalyst + AQE
  * cover every rewrite the reference hand-codes). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[DotQ].getCanonicalName, "graft_dot_q"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot_q takes exactly 2 arguments")
        DotQ(children.head, children(1))
      }))
  }
}
