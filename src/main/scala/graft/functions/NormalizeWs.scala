package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace-normalizing lowercase — the document-fingerprint
  * canonicalization `regexp_replace(lower(trim(text)), '\s+', ' ')` as
  * one compiled pass.
  *
  * The regex spelling walks the java.util.regex machinery over every
  * character of every document (profiled at ~3 s for one fingerprint
  * pass over the sf0.1 corpus); this expression trims (0x20 ends, SQL
  * trim semantics), lowercases via `UTF8String.toLowerCase` (exactly
  * Spark's `lower`), and squashes ASCII `\s` runs to single spaces in a
  * byte scan — safe on UTF-8 since multi-byte sequences never contain
  * bytes < 0x80, and both Java regex and RE2 `\s` are the same ASCII
  * class, so the output is byte-identical to the regex form (differential
  * spec asserts it).
  */
case class NormalizeWs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_ws requires a string input, got $dt")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize_ws"

  override def nullSafeEval(t: Any): Any =
    NormalizeWs.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NormalizeWs.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)
}

object NormalizeWs {
  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression = new NormalizeWs(exprs(0))

  /** SQL surface: `graft_normalize_ws(text)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize_ws", builder, "scala_udf")

  private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String): UTF8String = {
    val lowered = text.trim().toLowerCase
    val b = lowered.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    var o = 0
    var inWs = false
    while (i < b.length) {
      val c = b(i)
      if (isAsciiWs(c)) {
        if (!inWs) { out(o) = ' '; o += 1 }
        inWs = true
      } else {
        out(o) = c; o += 1
        inWs = false
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
