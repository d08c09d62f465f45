package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary min-heap whose root is the WORST kept
  * element under the total order (score desc, id asc). Insert is O(log k)
  * and the buffer never exceeds k entries — this is what bounds the
  * shuffle: each partial (map-side) aggregation state serializes to at
  * most k (double, long) pairs regardless of how many rows it saw. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))
  var n = 0

  // candidate (s, id) beats kept element at heap slot `i`
  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  // kept element a is worse than kept element b (heap order: worst at root)
  private def worse(a: Int, b: Int): Boolean =
    scores(a) < scores(b) || (scores(a) == scores(b) && ids(a) > ids(b))

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && worse(l, m)) m = l
      if (r < n && worse(r, m)) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def insert(s: Double, id: Long): Unit = {
    if (k == 0) return
    if (n < k) { scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1) }
    else if (beats(s, id, 0)) { scores(0) = s; ids(0) = id; siftDown(0) }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs sorted best-first: score desc, ties id asc. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

/** Partial top-k aggregate: `top_k_by_score(score, id, k)` keeps the k
  * (score, id) pairs with the highest score (ties broken by lowest id)
  * and evaluates to them as `array<struct<score double, id long>>`,
  * best-first.
  *
  * This replaces the `row_number() OVER (PARTITION BY query)` top-k
  * pattern, whose single exchange funnels EVERY scored row into one
  * reducer partition per query — with a 100 TB corpus and a small query
  * set that is a handful of hot reducers. Here map-side partial
  * aggregation truncates each partition's state to k pairs before the
  * shuffle, so the exchange carries ≤ k·(#partitions) rows per query and
  * the reducer merges pre-truncated heaps. Deterministic: the (score
  * desc, id asc) total order has no ties. */
case class TopKByScore(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k >= 0, s"k must be >= 0, got $k")

  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult = {
    val scoreOk = left.dataType == DoubleType || left.dataType == FloatType
    val idOk = right.dataType == LongType || right.dataType == IntegerType
    if (scoreOk && idOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double|float score, long|int id), got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  private def scoreOf(input: InternalRow): Any = left.eval(input)
  private def idOf(input: InternalRow): Any = right.eval(input)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreOf(input)
    val id = idOf(input)
    if (s != null && id != null) {
      val sd = s match { case f: java.lang.Float => f.toDouble; case d: java.lang.Double => d.doubleValue() }
      val il = id match { case i: java.lang.Integer => i.toLong; case l: java.lang.Long => l.longValue() }
      buffer.insert(sd, il)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.toSeq)

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {
  /** `top_k_by_score(score, id, k)` as a Column aggregate. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(new TopKByScore(
      GraftSqlBridge.expression(score),
      GraftSqlBridge.expression(id), k).toAggregateExpression())

  /** Builder behind the SQL surface — shared by [[register]] and
    * [[graft.GraftExtensions]]. `k` must be an integer literal. */
  def builder(exprs: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    if (exprs.length != 3)
      fail(s"graft_top_k(score, id, k) takes 3 arguments, got ${exprs.length}")
    if (!exprs(2).foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT", Map(
          "funcName" -> "`graft_top_k`",
          "paramName" -> "`k`", "paramType" -> "\"INT\""))
    exprs(2).eval() match {
      case n: Number => new TopKByScore(exprs(0), exprs(1), n.intValue)
      case other => fail(s"graft_top_k: `k` must be an integer literal, got $other")
    }
  }

  /** SQL registration: `SELECT qid, graft_top_k(score, id, 5) ...
    * GROUP BY qid` (k must be a literal). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_k", builder, "scala_udf")
}
