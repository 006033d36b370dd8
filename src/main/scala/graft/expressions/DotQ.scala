package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two array<bigint> columns — the hot inner
  * loop of every similarity operator (SimilarityOps).
  *
  * Why a native Catalyst expression instead of
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)`: higher-order functions are
  * interpreted (a lambda closure per element, a materialized intermediate
  * array per row, and they break whole-stage codegen). This expression
  * compiles to a tight primitive `for` loop inside the generated code —
  * no allocation, no virtual calls — and keeps the surrounding stage in
  * codegen. Semantics are identical (null if either side is null;
  * shorter-array length wins, matching zip_with's non-null prefix when
  * lengths differ; null ELEMENTS are treated as 0 rather than poisoning
  * the sum).
  *
  * Registered as `graft_dot_q` via [[graft.GraftExtensions]].
  */
case class DotQ(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // typed Seq[DataType]: AbstractDataType is private[sql], DataType is the
  // public subtype and satisfies the override covariantly
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}
