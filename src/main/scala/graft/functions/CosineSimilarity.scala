package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns.
  *
  * Why an Expression and not the `aggregate(zip_with(...))` composition
  * (kept as [[graft.operators.Similarity.cosineHof]]): Spark evaluates
  * higher-order lambdas interpreted — per element it allocates lambda
  * variables and boxes every float. This kernel is one fused while-loop,
  * participates in whole-stage codegen via [[doGenCode]], and computes
  * dot and both norms in a single pass. Numerically identical to the HOF
  * form (same sequential double accumulation order).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (ExpectsInputTypes) is private[sql]; check directly
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float|double> inputs, got " +
        s"${left.dataType} and ${right.dataType}")

  private def isFloat(dt: DataType): Boolean =
    dt match { case ArrayType(FloatType, _) => true; case _ => false }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimilarity.compute($a, $b, " +
        s"${isFloat(left.dataType)}, ${isFloat(right.dataType)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Single-pass kernel; called from both interpreted eval and generated
    * code (static forwarder). Accumulation order matches the HOF form so
    * results are bit-identical. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(new CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression =
    new CosineSimilarity(exprs(0), exprs(1))

  /** SQL registration: `SELECT graft_cosine(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", builder, "scala_udf")
}
