package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pandas `Series.str.extract` group semantics as one codegen'd pass:
  * NULL when the pattern does not match, NULL when the pattern matches
  * but the requested capture group did NOT PARTICIPATE in the match
  * (e.g. the other arm of an alternation matched), and the captured text
  * otherwise — including a legitimately empty participating capture.
  *
  * Spark's `regexp_extract` cannot express the middle case: it returns
  * `""` for a non-participating group, identical to an empty
  * participating capture, where pandas returns NaN (reference
  * dialect.py's regexp_extract path inherits the same conflation).
  * `java.util.regex.Matcher.group(n)` distinguishes them natively
  * (null vs ""), so the kernel is a direct matcher walk; the pattern
  * compiles once per expression instance and rides into codegen as a
  * reference object. */
case class RegexGroupExtract(child: Expression, pattern: String, group: Int)
    extends UnaryExpression {

  @transient private lazy val compiled = Pattern.compile(pattern)

  override def prettyName: String = "graft_regex_group"

  override def nullable: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      val n = Pattern.compile(pattern).matcher("").groupCount()
      if (group < 0 || group > n)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: pattern has $n capture group(s), asked for group $group")
      else TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $dt")
  }

  override def nullSafeEval(s: Any): Any =
    RegexGroupExtract.compute(s.asInstanceOf[UTF8String], compiled, group)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("pattern", compiled,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = graft.functions.RegexGroupExtract.compute($t, $pat, $group);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroupExtract =
    copy(child = newChild)
}

object RegexGroupExtract {
  /** null = no match OR group did not participate; "" only for a real
    * empty capture. */
  def compute(s: UTF8String, p: Pattern, group: Int): UTF8String = {
    val m = p.matcher(s.toString)
    if (!m.find()) null
    else {
      val g = m.group(group)
      if (g == null) null else UTF8String.fromString(g)
    }
  }
}
