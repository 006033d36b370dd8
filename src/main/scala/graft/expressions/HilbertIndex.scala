package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of an (x, y) pair — the clustering key behind
  * [[graft.operators.ZOrder.writeClusteredHilbert]]. The kernel's
  * state-dependent rotations don't reduce to the shift/mask arithmetic
  * that lets the Morton code stay declarative, so the column form is this
  * native expression: codegen emits a direct static call to
  * [[graft.operators.ZOrder.hilbertD]], keeping the write path's
  * clustering projection inside whole-stage codegen.
  *
  * Registered as `graft_hilbert(x, y)`; inputs are longs in [0, 65535]
  * (order-16 curve, 32-bit index), the [[graft.operators.ZOrder.zValue]]
  * contract. */
case class HilbertIndex(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.operators.ZOrder.hilbertD(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.operators.ZOrder.hilbertD($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
