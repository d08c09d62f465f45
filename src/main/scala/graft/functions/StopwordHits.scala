package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-wordlist hit counter — the kernel under language ID and
  * stopword-ratio quality scoring.
  *
  * Declarative spelling: per wordlist, `size(filter(filter(split(lower
  * (text), "\\W+"), nonEmpty), array_contains(list, _)))` — Spark
  * evaluates the lambda filters interpreted, re-splits the text once per
  * list, and re-lowers it too; with 4 language profiles that was ~2.1 s
  * of the sf0.1 sweep on its own. Here the text is lowered ONCE
  * (`UTF8String.toLowerCase`, exactly Spark's `lower`), tokenized in one
  * char scan (`\W+` split semantics: Java's ASCII `\w` = [a-zA-Z0-9_],
  * every other char — including all non-ASCII — separates), and each
  * token is probed against every list's hash set.
  *
  * Returns `array<int>` of length `lists.size + 1`: hit counts per list
  * (with multiplicity), then the total token count — so callers derive
  * ratios without a second tokenization. Byte/char semantics are pinned
  * to the declarative form by a differential property spec.
  */
case class StopwordHits(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {

  require(lists.nonEmpty, "need at least one wordlist")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_hits requires a string input, got $dt")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_stopword_hits"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lists.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(w => s.add(w))
      s
    }.toArray

  override def nullSafeEval(t: Any): Any =
    StopwordHits.compute(t.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.StopwordHits.compute($t, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  def compute(text: UTF8String,
              sets: Array[java.util.HashSet[String]]): ArrayData = {
    val s = text.toLowerCase.toString
    val counts = new Array[Int](sets.length + 1)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(s.charAt(i))) i += 1
      if (i > start) {
        counts(sets.length) += 1
        val tok = s.substring(start, i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(tok)) counts(j) += 1
          j += 1
        }
      }
    }
    val boxed = new Array[Any](counts.length)
    var k = 0
    while (k < counts.length) { boxed(k) = counts(k); k += 1 }
    new GenericArrayData(boxed)
  }
}
