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
  * codegen.
  *
  * Two null-semantics modes, chosen at plan time:
  *  - `hofParity = false` (the `graft_dot_q` SQL function): null if either
  *    ARRAY is null; null ELEMENTS are skipped (treated as 0); on a length
  *    mismatch the shorter prefix wins. The forgiving mode for hand-written
  *    calls over possibly-sparse vectors.
  *  - `hofParity = true` (what [[RewriteDotProduct]] substitutes): exactly
  *    the `aggregate(zip_with(...))` semantics it replaces — a null
  *    element OR a length mismatch (zip_with pads with nulls) poisons the
  *    result to null. Bit-for-bit interchangeable with the HOF idiom on
  *    EVERY input, which is what makes the automatic rewrite safe.
  *
  * Registered as `graft_dot_q` via [[graft.GraftExtensions]].
  */
case class DotQ(left: Expression, right: Expression,
                hofParity: Boolean = false)
  extends BinaryExpression with ExpectsInputTypes {

  // typed Seq[DataType]: AbstractDataType is private[sql], DataType is the
  // public subtype and satisfies the override covariantly
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q"
  // parity mode can return null even for non-null input arrays
  override def nullable: Boolean = hofParity || super.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (hofParity && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) {
        if (hofParity) return null // zip_with/aggregate null-poisoning
      } else acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      if (hofParity) {
        // `nullable` is true in this mode, so nullSafeCodeGen declared
        // `ev.isNull` as a real variable and it is safe to assign.
        s"""
           |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |if (!${ev.isNull}) {
           |  int $n = $a.numElements();
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true; break; // zip_with/aggregate null-poisoning
           |    }
           |    $acc += $a.getLong($i) * $b.getLong($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      } else {
        // Skip-null mode never produces null from non-null arrays, so it
        // must NOT mention ev.isNull: with non-nullable children the whole
        // expression is non-nullable and nullSafeCodeGen never DECLARES
        // the isNull variable (referencing it fails janino compilation and
        // silently falls back to the interpreted path).
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
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}
