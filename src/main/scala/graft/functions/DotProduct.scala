package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dot product of two
  * `array<float|double>` columns.
  *
  * This is the hot kernel under every LSH bucket assignment (planes ×
  * bands sign tests per row), random projection (outDim dots per row) and
  * IVF list assignment (nlist dots per row) — with the HOF
  * `aggregate(zip_with(...))` form each of those is an interpreted
  * per-element lambda with boxing. Here it is one fused while-loop that
  * participates in whole-stage codegen. Accumulation order is identical
  * to the HOF fold, so results are bit-for-bit unchanged (the oracle
  * parity of the seeded-plane operators is preserved exactly).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> inputs, got " +
        s"${left.dataType} and ${right.dataType}")

  private def isFloat(dt: DataType): Boolean =
    dt match { case ArrayType(FloatType, _) => true; case _ => false }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.compute($a, $b, " +
        s"${isFloat(left.dataType)}, ${isFloat(right.dataType)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Sequential accumulation, same order as the HOF fold (bit-identical). */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(new DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression =
    new DotProduct(exprs(0), exprs(1))

  /** SQL registration: `SELECT graft_dot(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", builder, "scala_udf")
}
