package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch: at most `capacity` (item, count)
  * counters. `offer` is the classic algorithm — increment a present
  * counter, insert while there is room, otherwise decrement ALL counters
  * by one (amortized O(1): each decrement pass is paid for by `capacity`
  * prior inserts). `absorb` is the mergeable-summaries combine (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi, PODS'12): sum counts, then if over
  * capacity subtract the (capacity+1)-th largest count from every counter
  * and drop the non-positive ones.
  *
  * Guarantees after any sequence of offers/absorbs over N total items:
  * every kept count is a lower bound on the true count, understating it
  * by at most N/(capacity+1) — so every item with true frequency above
  * N/(capacity+1) is guaranteed present. When `capacity` ≥ the number of
  * distinct items, no decrement ever fires and every count is EXACT. */
final class MGSketch(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)

  def offer(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def absorb(other: MGSketch): Unit = {
    other.counts.forEach { (item, c) =>
      val cur = counts.get(item)
      counts.put(item, cur + c)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-capacity-1 in ascending order
      val cut = vals(vals.length - capacity - 1)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** (item, count) pairs, count desc then item asc, truncated to k. */
  def top(k: Int): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    counts.forEach { (item, c) => arr(i) = (item, c); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr.take(k)
  }
}

/** Bounded-memory heavy hitters: `frequent_items(item, capacity, k)`
  * evaluates to the k most frequent items as
  * `array<struct<item string, cnt long>>` (count desc, ties item asc).
  *
  * This replaces the `GROUP BY item ORDER BY count(*) DESC LIMIT k`
  * pattern whose exchange carries the ENTIRE keyspace — for token or
  * n-gram frequency over a 100 TB corpus that is a vocabulary-sized
  * shuffle (billions of distinct keys) to answer a question about the
  * top twenty. Here each partition keeps a fixed `capacity`-counter
  * Misra–Gries sketch, the shuffle carries one ≤ capacity-entry sketch
  * per map-side partial, and the merge is the PODS'12 mergeable-summaries
  * combine — memory and network are O(capacity), independent of both row
  * count and key cardinality. Counts are exact (and the result equal to
  * the GROUP BY) whenever capacity ≥ distinct items; otherwise each
  * count is a lower bound short by at most N/(capacity+1), and every
  * item more frequent than that bound is guaranteed surfaced. */
case class FrequentItems(child: Expression, capacity: Int, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSketch] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")
  require(k > 0 && k <= capacity, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def prettyName: String = "frequent_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSketch = new MGSketch(capacity)

  override def update(buffer: MGSketch, input: InternalRow): MGSketch = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGSketch, input: MGSketch): MGSketch = {
    buffer.absorb(input)
    buffer
  }

  override def eval(buffer: MGSketch): Any =
    new GenericArrayData(buffer.top(k).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toSeq)

  override def serialize(buffer: MGSketch): Array[Byte] = {
    val entries = buffer.top(buffer.counts.size)
    val payloads = entries.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + payloads.map(p => 4 + p._1.length + 8).sum)
    bb.putInt(payloads.length)
    payloads.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val sketch = new MGSketch(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val buf = new Array[Byte](len)
      bb.get(buf)
      sketch.counts.put(new String(buf, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}

object FrequentItems {
  /** `frequent_items(item, capacity, k)` as a Column aggregate. */
  def apply(item: Column, capacity: Int, k: Int): Column =
    GraftSqlBridge.column(new FrequentItems(
      GraftSqlBridge.expression(item), capacity, k).toAggregateExpression())

  /** SQL registration: `SELECT graft_frequent_items(token, 1024, 10) ...`
    * (capacity and k must be integer literals). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_frequent_items", builder, "scala_udf")

  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression = {
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
        def intLit(i: Int, name: String): Int = {
          val e = exprs(i)
          if (!e.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              "NON_FOLDABLE_ARGUMENT", Map(
                "funcName" -> "`graft_frequent_items`",
                "paramName" -> s"`$name`", "paramType" -> "\"INT\""))
          e.eval() match {
            case n: java.lang.Integer => n.intValue
            case n: java.lang.Long => n.intValue
            case n: java.lang.Short => n.intValue
            case n: java.lang.Byte => n.intValue
            case other => fail(s"graft_frequent_items: `$name` must be an " +
              s"integer literal, got $other")
          }
        }
        if (exprs.length != 3)
          fail("graft_frequent_items(item, capacity, k) takes 3 arguments, " +
            s"got ${exprs.length}")
        new FrequentItems(exprs(0), intLit(1, "capacity"), intLit(2, "k"))
  }
}
