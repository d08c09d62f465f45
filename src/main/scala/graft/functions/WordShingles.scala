package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression building word n-gram shingles from a text
  * column in one compiled pass.
  *
  * This is the hot kernel at the head of every text-dedup pipeline
  * (MinHash, exact Jaccard, repetition stats, contamination): the HOF
  * form — `transform(sequence(0, size-n), i -> concat_ws(' ',
  * slice(toks, i+1, n)))` — walks an interpreted lambda per window and
  * allocates a slice array per element, which profiling showed to be
  * ~70% of the whole MinHash signature cost. Here tokenization, window
  * assembly and (optionally) first-occurrence dedup run as one static
  * Java method that participates in whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF form (and to the DuckDB oracle
  * rendering in [[graft.operators.Dedup.shinglesOracleSqlExpr]]):
  * tokens = non-empty pieces of a `\s+` split; texts with ≥ n tokens
  * yield every consecutive n-window joined by a single space (with
  * multiplicity unless `distinct`); shorter texts fall back to the one
  * whitespace-normalized whole text (possibly the empty string).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string input, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(t: Any): Any =
    WordShingles.compute(t.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.WordShingles.compute($t, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** SQL surface: `graft_shingles(text, n[, distinct])`. Arguments are
    * validated into clean AnalysisExceptions — a non-literal, NULL or
    * mistyped `n`/`distinct` used to surface as a raw
    * ClassCastException/NPE from the builder. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", builder, "scala_udf")

  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression = {
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
        def foldableArg(i: Int, name: String, tpe: String): Any = {
          val e = exprs(i)
          if (!e.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              "NON_FOLDABLE_ARGUMENT", Map(
                "funcName" -> "`graft_shingles`",
                "paramName" -> s"`$name`", "paramType" -> s""""$tpe""""))
          val v = e.eval()
          if (v == null) fail(s"graft_shingles: `$name` must not be NULL")
          v
        }
        if (exprs.length < 2 || exprs.length > 3)
          fail("graft_shingles(text, n[, distinct]) takes 2 or 3 " +
            s"arguments, got ${exprs.length}")
        val n = foldableArg(1, "n", "INT") match {
          case i: java.lang.Integer => i.intValue
          case l: java.lang.Long => l.intValue
          case s: java.lang.Short => s.intValue
          case b: java.lang.Byte => b.intValue
          case other => fail(s"graft_shingles: `n` must be an integer " +
            s"literal, got $other")
        }
        if (n < 1) fail(s"graft_shingles: `n` must be >= 1, got $n")
        val distinct =
          if (exprs.length < 3) true
          else foldableArg(2, "distinct", "BOOLEAN") match {
            case b: java.lang.Boolean => b.booleanValue
            case other => fail(s"graft_shingles: `distinct` must be a " +
              s"boolean literal, got $other")
          }
        new WordShingles(exprs(0), n, distinct)
  }

  private val ws = Pattern.compile("\\s+")

  /** One pass: split, window, join, optional first-occurrence dedup. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val pieces = ws.split(text.toString)
    // java split keeps a leading "" for leading whitespace; drop empties
    // (the HOF form's filter(len > 0))
    var nTok = 0
    var i = 0
    while (i < pieces.length) {
      if (!pieces(i).isEmpty) { pieces(nTok) = pieces(i); nTok += 1 }
      i += 1
    }
    val out =
      if (nTok < n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < nTok) {
          if (j > 0) sb.append(' ')
          sb.append(pieces(j)); j += 1
        }
        Array(sb.toString)
      } else {
        val grams = new Array[String](nTok - n + 1)
        var s = 0
        while (s <= nTok - n) {
          val sb = new java.lang.StringBuilder
          var j = s
          while (j < s + n) {
            if (j > s) sb.append(' ')
            sb.append(pieces(j)); j += 1
          }
          grams(s) = sb.toString
          s += 1
        }
        grams
      }
    val kept =
      if (!distinct) out
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var k = 0
        while (k < out.length) { seen.add(out(k)); k += 1 }
        seen.toArray(new Array[String](seen.size))
      }
    val utf8 = new Array[AnyRef](kept.length)
    var m = 0
    while (m < kept.length) { utf8(m) = UTF8String.fromString(kept(m)); m += 1 }
    new GenericArrayData(utf8)
  }
}
