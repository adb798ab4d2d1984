package graft.vector.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels as native Catalyst expressions.
  *
  * An unrolled `element_at` fold works but generates a dim-sized
  * expression tree: Catalyst analysis cost grows per query, and past
  * ~100 terms the generated method blows the JVM size limit inside join
  * predicates, silently falling back to interpreted evaluation (measured:
  * 19 µs/dot interpreted vs <0.1 µs here). These expressions emit ONE
  * static call whose kernel loops over the array data — tiny generated
  * code, primitive float access, no boxing.
  *
  * The accumulation folds ascending from 0.0 in double, matching the
  * DuckDB oracle's `SUM(... ORDER BY i)` bit-for-bit.
  */
object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def norm2(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

/** dot(a, b) over two array<float> columns → double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.vector.expressions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** L2 norm of an array<float> column → double. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VectorKernels.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.vector.expressions.VectorKernels.norm2($a)")
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
  override def prettyName: String = "vec_norm"
}

object VectorExpressions {
  def vecDot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def vecNorm(a: Column): Column = column(L2Norm(expression(a)))
}
