package graft.sim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Compiled vector kernels for the similarity hot path.
  *
  * The HOF dot product (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * interpreted by Catalyst — each element access walks an expression
  * tree, and srp/cosine evaluate one such fold per hyperplane/candidate
  * per row. [[Dot]] does the same left-to-right multiply-accumulate in
  * one compiled loop (same shape as the [[graft.text.TextKernels]]
  * string kernels).
  *
  * Contract: equal-length arrays with non-null elements (embedding
  * columns are fixed-dimension). Summation order is identical to the
  * sequential HOF fold, so results are bit-identical.
  */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Codegen'd dot product of two array<double> columns. */
case class Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def isArr(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isArr(left.dataType) && isArr(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"Dot requires two array<double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sim.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dot =
    copy(left = newLeft, right = newRight)
}
