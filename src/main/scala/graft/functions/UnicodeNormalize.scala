package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD via the JDK's
  * `java.text.Normalizer`) — the canonicalization step that belongs
  * BEFORE any fingerprint/shingle/dedup pass: "café" spelled with a
  * precomposed é and with e + combining U+0301 are byte-distinct (md5,
  * shingles, and exact dedup all miss the match) but render identically,
  * and web crawls mix both freely.
  *
  * Codegen'd with an ASCII fast path: every normalization form is the
  * identity on pure-ASCII text, detected with one byte scan (UTF-8
  * multi-byte sequences always carry the high bit), so the dominant
  * crawl case never allocates — only strings that actually contain
  * non-ASCII pay for the JDK normalizer walk. Per-row, no shuffle; sits
  * inside whole-stage codegen like any builtin. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.forms.contains(form),
    s"graft_unicode_normalize: form must be one of " +
      s"${UnicodeNormalize.forms.mkString(", ")}, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_normalize requires a string input, got $dt")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(t: Any): Any =
    UnicodeNormalize.compute(t.asInstanceOf[UTF8String],
      Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.UnicodeNormalize.compute($t, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** SQL surface: `graft_unicode_normalize(text[, form])`, form an
    * uppercase string literal, default NFC. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_unicode_normalize", builder, "scala_udf")

  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression = {
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
        if (exprs.isEmpty || exprs.length > 2)
          fail("graft_unicode_normalize(text[, form]) takes 1 or 2 " +
            s"arguments, got ${exprs.length}")
        val form = if (exprs.length == 1) "NFC" else {
          val e = exprs(1)
          if (!e.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              "NON_FOLDABLE_ARGUMENT", Map(
                "funcName" -> "`graft_unicode_normalize`",
                "paramName" -> "`form`", "paramType" -> "\"STRING\""))
          e.eval() match {
            case s: UTF8String if forms.contains(s.toString) => s.toString
            case other => fail(s"graft_unicode_normalize: form must be one " +
              s"of ${forms.mkString(", ")}, got $other")
          }
        }
        new UnicodeNormalize(exprs(0), form)
  }

  def compute(text: UTF8String, form: Normalizer.Form): UTF8String = {
    // ASCII fast path: every form is the identity on pure ASCII, and
    // UTF-8 marks non-ASCII with the high bit — one branchy byte scan
    // skips the JDK normalizer (and all allocation) for the common case
    val bytes = text.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) text
    else {
      val s = text.toString
      if (Normalizer.isNormalized(s, form)) text
      else UTF8String.fromString(Normalizer.normalize(s, form))
    }
  }
}
