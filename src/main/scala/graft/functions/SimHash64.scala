package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column in ONE compiled per-row pass — no
  * explode, no aggregation, NO SHUFFLE.
  *
  * Replaces the explode + 64-vote-aggregate formulation of
  * `Dedup.simhashTable` (kept as the differential reference): that form
  * was itself the fix for interpreted HOF lambdas, but it still paid a
  * row per token through the Generate and a hash-shuffle of 64 ints per
  * document. Per-bit vote counting is a pure function of one document's
  * token stream, so the right plan is a projection: tokenize (same `\s+`
  * split/drop-empties as [[WordShingles]]), one xxhash64 per token
  * (byte-identical to the `xxhash64` SQL expression: same XXH64 kernel,
  * same seed 42 — differential-spec'd), ±1 vote per bit, sign → bit.
  * Zero tokens hash to signature 0, matching the aggregate form's
  * left-join + coalesce(0) for never-exploded docs.
  *
  * Integer vote sums are order-independent, so this is bit-identical to
  * the aggregate form on every input. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $dt")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    SimHash64.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SimHash64.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** xxhash64 of a UTF8String with Spark's default seed — the same bytes
    * and kernel the `xxhash64` SQL expression feeds XXH64. */
  private[functions] def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  def compute(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    // token walk without materializing a String[]: scan bytes for
    // \s+ boundaries? The reference tokenization is java \s+ over the
    // decoded string (Unicode whitespace class), so decode once and
    // reuse the WordShingles splitter for byte-exact token parity.
    val pieces = Tokenize.split(text)
    var t = 0
    while (t < pieces.length) {
      val tok = pieces(t)
      if (tok != null) {
        val h = hashUtf8(UTF8String.fromString(tok), 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** Shared `\s+`-split tokenizer: identical semantics to
  * [[WordShingles.compute]]'s splitter (java regex split, empties
  * dropped — null-padded tail instead of a second allocation). */
private[functions] object Tokenize {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Non-empty tokens in order; the returned array may carry a
    * null-padded tail (callers stop at the first null or check). */
  def split(text: UTF8String): Array[String] = {
    val pieces = ws.split(text.toString)
    var n = 0
    var i = 0
    while (i < pieces.length) {
      if (!pieces(i).isEmpty) { pieces(n) = pieces(i); n += 1 }
      i += 1
    }
    var j = n
    while (j < pieces.length) { pieces(j) = null; j += 1 }
    pieces
  }
}
