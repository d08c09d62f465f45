package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a HARD per-group memory bound: the aggregation
  * buffer never holds more than `limit` elements — once a group reaches
  * the limit, further inputs are discarded (the group is already known to
  * be over any occupancy cap below the limit, so its exact contents no
  * longer matter to a caller that drops oversized groups).
  *
  * This exists for the LSH bucket-collect in [[graft.operators.Dedup]]:
  * a degenerate mega-bucket (viral boilerplate surviving exact dedup by a
  * byte of noise) would make a plain `collect_list` buffer the whole
  * bucket in ONE aggregation task before any post-filter could drop it —
  * the classic single-task OOM at corpus scale. Bounding the buffer
  * turns "collect then filter" into a true streaming cap: per-group state
  * is ≤ limit elements on the map side, in the shuffle, and on the
  * reduce side, no matter how skewed the bucket distribution is.
  *
  * Determinism contract for callers filtering at `cap = limit - 1`:
  * groups with ≤ cap total elements are collected COMPLETELY (bit-equal
  * to `collect_list`); groups that overflow evaluate to an arbitrary
  * `limit`-element subset, but their SIZE is ≥ limit > cap, so the
  * caller's size filter drops them regardless of which subset survived.
  * Null inputs are skipped, matching `collect_list`. */
case class BoundedCollect(child: Expression, limit: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(limit >= 1, s"limit must be >= 1, got $limit")

  override def prettyName: String = "graft_bounded_collect"

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length < limit) {
      val v = child.eval(input)
      // copy: unsafe rows/arrays handed to eval are backed by reused
      // buffers; storing them without a copy aliases every element to
      // the last row seen
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (buffer.length < limit && i < other.length) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  // serialize the buffer as a single unsafe row holding one array value —
  // the same wire format collect_list uses, bounded at `limit` elements
  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buffer.toSeq))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0).toObjectArray(child.dataType)
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.length && buf.length < limit) {
      buf += InternalRow.copyValue(arr(i))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BoundedCollect =
    copy(child = newChild)
}

object BoundedCollect {
  /** `graft_bounded_collect(value, limit)` as a Column aggregate. */
  def apply(value: Column, limit: Int): Column =
    GraftSqlBridge.column(new BoundedCollect(
      GraftSqlBridge.expression(value), limit).toAggregateExpression())
}
