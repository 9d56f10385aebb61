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

  /** The (i, j, xi, xj) upper-triangle pair stream behind
    * [[Similarity.embMoments]], generated in one compiled pass: each
    * component is micro-rounded exactly like the Column cascade
    * `round(x.cast("double") * 1e6, 0).cast("long")` (Spark's Round on
    * doubles is BigDecimal.valueOf + HALF_UP — NOT Math.round, which
    * differs on negative halfway values), then the ordered pairs with
    * i in [iStart, min(iEnd, d)) are emitted as struct rows. The
    * i-range bounds the PER-ROW materialization: a full d = 1024 pass
    * would allocate 524k structs (~16 MB) per row, so embMoments
    * splits wide embeddings into i-blocks and unions the narrow
    * passes. Replaces an interpreted nested transform/sequence HOF
    * that walked an expression tree per pair. */
  def momentPairs(v: ArrayData, isFloat: Boolean, iStart: Int,
      iEnd: Int): ArrayData = {
    val d = v.numElements()
    val lo = math.max(iStart, 0)
    val hi = math.min(iEnd, d)
    if (lo >= hi) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val xm = new Array[Long](d)
    var i = lo // xm needed for i in [lo, d): pair partners are j >= i
    while (i < d) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      xm(i) = java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    var n = 0
    i = lo
    while (i < hi) { n += d - i; i += 1 }
    val out = new Array[Any](n)
    var k = 0
    i = lo
    while (i < hi) {
      var j = i
      while (j < d) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, j, xm(i), xm(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd upper-triangle moment-pair stream of an embedding column
  * (array<float> or array<double>), restricted to first-index block
  * [iStart, iEnd) — see [[VecKernels.momentPairs]]. */
case class MomentPairs(child: Expression, iStart: Int = 0,
    iEnd: Int = Int.MaxValue) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // lazy: the child is unresolved at construction (Bridge wraps a bare
  // column reference); dataType only exists after analysis
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"MomentPairs requires array<float|double>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("xi",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("xj",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.momentPairs(input.asInstanceOf[ArrayData], isFloat,
      iStart, iEnd)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sim.VecKernels.momentPairs($c, $isFloat, $iStart, $iEnd)")
  override protected def withNewChildInternal(newChild: Expression): MomentPairs =
    copy(child = newChild)
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
