package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature (k seeded-xxhash64 minima over word n-gram
  * shingles) in ONE compiled per-row pass — no explode, no aggregation,
  * NO SHUFFLE.
  *
  * Replaces the explode + k-column groupBy-min formulation of
  * `Dedup.minhashSignatures` (kept as the differential reference). That
  * form was the fix for interpreted HOF folds, but it still generates a
  * row per (document, shingle) and shuffles k longs per document into a
  * hash aggregate; a signature is a pure function of one document's
  * shingle set, so the right plan is a projection. Byte-identical hash
  * family: base = xxhash64(shingle) (seed 42), member i =
  * xxhash64(base, seed+i) — i.e. XXH64.hashLong(seed+i,
  * XXH64.hashLong(base, 42)), matching the SQL expression's
  * seed-chaining fold over its arguments (differential-spec'd against
  * the aggregate form on real corpora).
  *
  * Per-row state is k longs + the shingle array [[WordShingles]] already
  * builds — O(k + text) regardless of corpus size. */
case class MinHashSig(child: Expression, numHashes: Int, shingleN: Int,
                      seed: Long) extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  require(shingleN >= 1, s"shingle width must be >= 1, got $shingleN")

  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    MinHashSig.compute(t.asInstanceOf[UTF8String], numHashes, shingleN, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.MinHashSig.compute($t, $numHashes, $shingleN, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def compute(text: UTF8String, k: Int, n: Int, seed: Long): ArrayData = {
    val shingles = WordShingles.compute(text, n, distinct = true)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val sh = shingles.getUTF8String(s)
      // base hash of the variable-length shingle bytes once, then k
      // cheap long re-hashes — the same family as the SQL-expression
      // form: xxhash64(sh) then xxhash64(base, seed+i)
      val h1 = XXH64.hashLong(
        XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset,
          sh.numBytes, 42L), 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(seed + i, h1)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}
