package graft.functions

import java.nio.ByteBuffer

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch (Cormode & Muthukrishnan 2005): `depth` rows of
  * `width` counters; item `x` increments cell `(d, h_d(x) mod width)` in
  * every row, and a point estimate is the MIN over rows. Estimates are
  * one-sided: `est ≥ true` always, and `est ≤ true + ε·N` where
  * `ε ≈ e/width`, with probability `1 − e^(−depth)` over the hash choice
  * (fixed MurmurHash3 row seeds here, so for a given dataset the
  * estimate is deterministic). Where [[MGSketch]] answers "WHICH items
  * are frequent", the CM sketch answers "how frequent is THIS item" for
  * any item, without storing keys — the mergeable per-shard frequency
  * table a distributed pipeline probes for novelty weighting, spam-key
  * lookups, or join-skew hints on keys chosen AFTER the scan. */
final class CMSketch(val width: Int, val depth: Int) {
  val cells = new Array[Long](width * depth)

  @inline private def slot(item: String, d: Int): Int =
    d * width + java.lang.Math.floorMod(MurmurHash3.stringHash(item, d), width)

  def offer(item: String): Unit = {
    var d = 0
    while (d < depth) { cells(slot(item, d)) += 1L; d += 1 }
  }

  def absorb(other: CMSketch): Unit = {
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
  }

  def estimate(item: String): Long = {
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = cells(slot(item, d))
      if (c < min) min = c
      d += 1
    }
    min
  }
}

/** `count_min(item, width, depth)` → the flattened `depth·width` counter
  * array (`array<long>`, row-major). Shuffle and memory are O(width·depth)
  * per partial — a fixed 64 KB at the default 2048×4 — independent of row
  * count and key cardinality, exactly like the other sketch aggregates.
  * Probe the result with [[CountMinEstimate]] (`graft_cm_estimate`). */
case class CountMinAgg(child: Expression, width: Int, depth: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CMSketch] with UnaryLike[Expression] {

  require(width > 0, s"width must be positive, got $width")
  require(depth > 0, s"depth must be positive, got $depth")

  override def prettyName: String = "count_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): CMSketch = new CMSketch(width, depth)

  override def update(buffer: CMSketch, input: InternalRow): CMSketch = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: CMSketch, input: CMSketch): CMSketch = {
    buffer.absorb(input)
    buffer
  }

  // self-describing payload: [width, depth] header ahead of the cells —
  // width·depth alone cannot distinguish 2048×4 from 4096×2, and a
  // transposed probe would silently read garbage estimates
  override def eval(buffer: CMSketch): Any =
    new GenericArrayData(Array(width.toLong, depth.toLong) ++ buffer.cells)

  override def serialize(buffer: CMSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.cells.length)
    bb.asLongBuffer().put(buffer.cells)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CMSketch = {
    val sketch = new CMSketch(width, depth)
    ByteBuffer.wrap(bytes).asLongBuffer().get(sketch.cells)
    sketch
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** `cm_estimate(sketch, item)` — MIN-over-rows point lookup against a
  * [[CountMinAgg]] result. CodegenFallback is fine here: the sketch is a
  * one-row aggregate and probes run over key lists, never the corpus. */
case class CountMinEstimate(left: Expression, right: Expression,
                            width: Int, depth: Int)
    extends BinaryExpression with CodegenFallback {

  require(width > 0 && depth > 0, s"need positive width/depth, got $width/$depth")

  override def prettyName: String = "cm_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, string), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any, item: Any): Any = {
    val arr = sketch.asInstanceOf[ArrayData]
    require(arr.numElements() == 2 + width * depth,
      s"sketch has ${arr.numElements()} elements, expected 2 + $width x $depth")
    // the header makes dimension mismatches a hard error instead of
    // silent garbage (width*depth alone cannot tell 2048x4 from 4096x2)
    require(arr.getLong(0) == width && arr.getLong(1) == depth,
      s"sketch was built as ${arr.getLong(0)} x ${arr.getLong(1)}, " +
        s"probed as $width x $depth")
    val key = item.asInstanceOf[UTF8String].toString
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = 2 + d * width +
        java.lang.Math.floorMod(MurmurHash3.stringHash(key, d), width)
      val c = arr.getLong(idx)
      if (c < min) min = c
      d += 1
    }
    min
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  val DefaultWidth = 2048
  val DefaultDepth = 4

  /** `count_min(item, width, depth)` as a Column aggregate. */
  def apply(item: Column, width: Int = DefaultWidth,
            depth: Int = DefaultDepth): Column =
    GraftSqlBridge.column(new CountMinAgg(
      GraftSqlBridge.expression(item), width, depth).toAggregateExpression())

  /** Point estimate against an [[apply]] result column. */
  def estimate(sketch: Column, item: Column, width: Int = DefaultWidth,
               depth: Int = DefaultDepth): Column =
    GraftSqlBridge.column(CountMinEstimate(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(item),
      width, depth))

  private def intLit(exprs: Seq[Expression], i: Int, fn: String,
                     name: String): Int = {
    val e = exprs(i)
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT", Map("funcName" -> s"`$fn`",
          "paramName" -> s"`$name`", "paramType" -> "\"INT\""))
    e.eval() match {
      case n: java.lang.Integer => n.intValue
      case n: java.lang.Long => n.intValue
      case n: java.lang.Short => n.intValue
      case n: java.lang.Byte => n.intValue
      case other => throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" -> s"$fn: `$name` must be an integer literal, got $other"))
    }
  }

  /** Builder behind `graft_count_min(item, width, depth)`. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"graft_count_min(item, width, depth) takes 3 arguments, got ${exprs.length}"))
    new CountMinAgg(exprs(0), intLit(exprs, 1, "graft_count_min", "width"),
      intLit(exprs, 2, "graft_count_min", "depth"))
  }

  /** Builder behind `graft_cm_estimate(sketch, item, width, depth)`. */
  def estimateBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 4)
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"graft_cm_estimate(sketch, item, width, depth) takes 4 arguments, got ${exprs.length}"))
    CountMinEstimate(exprs(0), exprs(1),
      intLit(exprs, 2, "graft_cm_estimate", "width"),
      intLit(exprs, 3, "graft_cm_estimate", "depth"))
  }

  /** SQL registration for ad-hoc sessions (the extension injects these
    * cluster-wide). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_count_min", builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cm_estimate", estimateBuilder, "scala_udf")
  }
}
