package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Luhn (mod-10) checksum validation — the payment-card check
  * digit algorithm (ISO/IEC 7812-1, public domain since 1960). The PII
  * detector's precision gate: a random 16-digit run passes Luhn only
  * 1 in 10 times, so validating candidates turns "any long number" into
  * "plausibly a card number" before a scrub or a report counts it.
  *
  * true iff the input is entirely ASCII digits, at least 2 long, and
  * Σ (digits, doubling every second from the RIGHT, doubled values
  * folding as d*2-9 above 9) ≡ 0 (mod 10). Non-digit characters or a
  * too-short string yield false (not null — "not a card" is an answer);
  * a NULL input is NULL. One byte scan, codegen'd; the oracle mirrors
  * it as a list_transform/list_sum comprehension over the digit chars
  * (see [[graft.operators.TextAnalysis.luhnOracleSqlExpr]]).
  */
case class LuhnCheck(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_luhn requires a string input, got $dt")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_luhn"

  override def nullSafeEval(t: Any): Any =
    LuhnCheck.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.LuhnCheck.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): LuhnCheck =
    copy(child = newChild)
}

object LuhnCheck {
  def builder(exprs: Seq[Expression]): Expression = new LuhnCheck(exprs(0))

  def luhn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LuhnCheck(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** SQL surface: `graft_luhn(digits)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_luhn", builder, "scala_udf")

  def compute(text: UTF8String): Boolean = {
    val b = text.getBytes
    if (b.length < 2) return false
    var sum = 0
    var i = b.length - 1
    var second = false
    while (i >= 0) {
      val c = b(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (second) {
        d *= 2
        if (d > 9) d -= 9
      }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }
}
