package graft.api

import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Shared DataFrame/Series surface — the reference's `GenericMixin`
  * (generic.py:6-93). Immutable: every op returns a new object (the
  * `@copied` copy-on-write pattern, utils.py:5-16, becomes plain
  * functional style). */
private[graft] trait GenericLike[Self] {
  private[graft] def frame: SqlFrame
  protected def rebuild(f: SqlFrame): Self
  protected def klass: String
  def ndim: Int

  /** Axis resolution with the exact pandas ValueError (base.py:48-53). */
  protected def getAxis(axis: Any): Int

  protected def badAxis(axis: Any): Nothing =
    throw new GraftValueError(s"No axis named $axis for object type $klass")

  /** COUNT(*) (generic.py:8-10). Eager, like the reference. */
  def len: Long = frame.count()

  def empty: Boolean = len == 0

  def size: Long = len * frame.nCols

  /** Index level names (None = unnamed, like the default rowid index). */
  def indexNames: IndexedSeq[Option[String]] = frame.indexNames

  /** Materialize just the index values (generic.py:24-29). */
  def indexValues: Seq[Seq[Any]] =
    frame.df.select(frame.idxCols: _*).collect().toSeq.map(_.toSeq)

  /** LIMIT n (generic.py:46-48). Row set changes → re-anchor the plan. */
  def head(n: Int = 5): Self = rebuild(frame.rePhysical(frame.df.limit(n)))

  /** COUNT then LIMIT/OFFSET — two jobs, faithful to generic.py:50-57.
    * LIMIT/OFFSET take Int; past 2^31 rows the offset is applied as a
    * contiguous-rowid range filter instead (two narrow passes, no
    * Int wrap — the scale-safe path for a 100 TB table's tail). */
  def tail(n: Int = 5): Self = {
    val offset = math.max(0L, len - n)
    val df =
      if (offset == 0L) frame.df.limit(n)
      else if (offset <= Int.MaxValue) frame.df.offset(offset.toInt).limit(n)
      else Align.zipWithRowId(frame.df, "__graft_tail_rid")
        .where(org.apache.spark.sql.functions.col("__graft_tail_rid") >= offset)
        .drop("__graft_tail_rid")
    rebuild(frame.rePhysical(df))
  }

  /** Exact tail in ONE distributed pass — the extension-surface
    * alternative to [[tail]]'s reference-faithful COUNT-then-OFFSET
    * (generic.py:50-57), which scans twice. Every partition emits its
    * row count plus its last ≤ `n` rows in a single mapPartitions
    * sweep; the driver — holding one (count, ≤ n rows) pair per
    * partition, never the corpus — drops the surplus rows from the
    * earliest contributing partition and re-parallelizes the ≤ n
    * survivors. Row order matches [[tail]] exactly: Spark's global row
    * order is partition index, then within-partition order, which is
    * precisely how the per-partition buffers are reassembled.
    *
    * Use when the table is scan-dominated (at 100 TB the default's
    * second full scan IS the cost) and `n` is interactive-small: the
    * result is driver-resident by construction — the same contract as
    * `to_pandas` — so `n` must fit on the driver (enforced ≤ 10M). */
  def tailOnePass(n: Int = 5): Self = {
    require(n >= 0, s"tailOnePass needs n >= 0, got $n")
    require(n <= 10000000, s"tailOnePass result is driver-resident; n=$n is not interactive-small")
    val df = frame.df
    val spark = df.sparkSession
    val parts =
      if (n == 0) Array.empty[(Int, Long, Array[org.apache.spark.sql.Row])]
      else df.rdd.mapPartitionsWithIndex { (pid, it) =>
        val buf = new scala.collection.mutable.ArrayDeque[org.apache.spark.sql.Row](
          math.min(n, 16))
        var cnt = 0L
        it.foreach { r =>
          cnt += 1L
          buf.append(r)
          if (buf.size > n) buf.removeHead()
        }
        Iterator.single((pid, cnt, buf.toArray))
      }.collect().sortBy(_._1)
    val total = parts.iterator.map(_._2).sum
    val offset = math.max(0L, total - n)
    var before = 0L
    val keep = parts.iterator.flatMap { case (_, cnt, rows) =>
      val firstKept = before + cnt - rows.length // global ordinal of rows.head
      before += cnt
      rows.iterator.zipWithIndex.collect {
        case (r, i) if firstKept + i >= offset => r
      }
    }.toIndexedSeq
    import scala.jdk.CollectionConverters._
    rebuild(frame.rePhysical(
      spark.createDataFrame(keep.asJava, df.schema)))
  }

  /** Single cell at row ordinal `r` of column expression `c` — the shared
    * scalar probe behind DataFrame/Series `iat`, long-offset safe. */
  private[graft] def cellAt(c: org.apache.spark.sql.Column, r: Long): Any = {
    val proj = frame.df.select(c)
    val picked =
      if (r <= Int.MaxValue) proj.offset(r.toInt).limit(1)
      else Align.zipWithRowId(proj, "__graft_iat_rid")
        .where(org.apache.spark.sql.functions.col("__graft_iat_rid") === r)
        .drop("__graft_iat_rid")
    picked.collect().head.get(0)
  }

  def isna: Self = rebuild(frame.mapCols((c, _, _) => c.isNull))
  def isnull: Self = isna
  def notna: Self = rebuild(frame.mapCols((c, _, _) => c.isNotNull))
  def notnull: Self = notna
  def abs: Self = rebuild(frame.mapCols((c, _, _) => org.apache.spark.sql.functions.abs(c)))
  def round(decimals: Int = 0): Self =
    rebuild(frame.mapCols((c, _, _) => org.apache.spark.sql.functions.round(c, decimals)))

  /** CAST every data column (generic.py:59-62). */
  def astype(dt: DataType): Self = rebuild(frame.mapCols((c, _, _) => c.cast(dt)))

  /** Single-element truthiness probe (generic.py:35-44). */
  def boolValue(): Boolean = {
    if (size != 1)
      throw new GraftValueError(
        s"The truth value of a $klass is ambiguous. Use a.empty, a.bool(), " +
          s"a.item(), a.any() or a.all().")
    frame.df.select(frame.colAt(0)).collect().head.get(0) match {
      case b: Boolean => b
      case _ =>
        throw new GraftValueError(
          s"bool cannot act on a non-boolean single element $klass")
    }
  }

  def pipe[T](f: Self => T): T = f(this.asInstanceOf[Self])

  /** repr convenience — the analog of `use_repr_workaround`
    * (__init__.py:5-18): print the labeled view. */
  def show(n: Int = 20): Unit = toSpark(includeIndex = true).show(n, false)

  /** Expose as a plain Spark DataFrame with label-derived names (None →
    * `col_N`, duplicates suffixed) — the bridge out of the pandas layer and
    * the path Verify/Bench use. */
  def toSpark(includeIndex: Boolean = false): org.apache.spark.sql.DataFrame = {
    val used = scala.collection.mutable.Set[String]()
    def uniq(base: String): String = {
      var n = base; var k = 1
      while (used.contains(n)) { n = s"${base}_$k"; k += 1 }
      used += n; n
    }
    val idxSel =
      if (includeIndex)
        (0 until frame.nIdx).map(i => frame.idxCols(i)
          .as(uniq(frame.indexNames(i).getOrElse(s"index_$i"))))
      else Nil
    val dataSel = (0 until frame.nCols).map(i =>
      frame.colAt(i).as(uniq(frame.colLabels(i).getOrElse(s"col_$i"))))
    frame.df.select(idxSel ++ dataSel: _*)
  }
}
