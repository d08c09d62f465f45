package graft.api

import graft.core._
import graft.core.Semantics.BinOp
import org.apache.spark.sql.{Column, DataFrame => SDF, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pandas-semantics DataFrame over a lazy Spark plan — the analog of the
  * reference's `DataFrame` (alchemy.py:99-350). Column labels are
  * client-side metadata (duplicates allowed); the physical plan is a plain
  * Spark `DataFrame`, so Catalyst collapses the per-op projection chain and
  * plans all alignment joins (broadcast/SMJ + AQE) for free. */
final class DataFrame private[graft] (
    private[graft] val frame: SqlFrame)
    extends GenericLike[DataFrame] with DataFrameExtensions
    with SetOpsExtensions {

  def ndim: Int = 2
  protected def klass: String = "DataFrame"
  protected def rebuild(f: SqlFrame): DataFrame = new DataFrame(f)

  def columns: IndexedSeq[Option[String]] = frame.colLabels
  def shape: Seq[Long] = Seq(len, frame.nCols.toLong)

  protected def getAxis(axis: Any): Int = axis match {
    case 0 | "index" | "rows" => 0
    case 1 | "columns" => 1
    case null => 1 // axis=None → columns (alchemy.py:172)
    case _ => badAxis(axis)
  }

  // --------------------------------------------------------------- selection

  /** Column access by label → Series (`__getattr__`/`_seq_at`,
    * alchemy.py:106-118). */
  def apply(name: String): Series = {
    val i = frame.colLabels.indexOf(Some(name))
    if (i < 0) throw new GraftKeyError(s"'$name'")
    colAt(i)
  }

  def col(name: String): Series = apply(name)

  /** Series of column i (positional; negative wraps). Metadata-only: the
    * Series stays anchored to this frame's base, so `df("a") * df("b")`
    * fuses into one projection. */
  def colAt(i0: Int): Series = {
    val i = if (i0 < 0) frame.nCols + i0 else i0
    new Series(frame.selectOrdinals(Seq(i)))
  }

  /** Project a subset of columns by label (first occurrence). */
  def select(names: Seq[String]): DataFrame = {
    val ords = names.map { n =>
      val i = frame.colLabels.indexOf(Some(n))
      if (i < 0) throw new GraftKeyError(s"'$n'")
      i
    }
    rebuild(frame.selectOrdinals(ords))
  }

  /** (label, Series) per column — `iteritems` (alchemy.py:130-132). */
  def items: Seq[(Option[String], Series)] =
    frame.colLabels.indices.map(i => (frame.colLabels(i), colAt(i)))

  /** Collect rows as (index, values) — `iterrows` (alchemy.py:124-128). */
  def iterrows(): Iterator[(Any, Seq[Any])] = {
    val nIdx = frame.nIdx
    val multi = frame.isMultiIndex
    val it = frame.df.toLocalIterator()
    new Iterator[(Any, Seq[Any])] {
      def hasNext = it.hasNext
      def next() = {
        val r = it.next()
        val idx: Any = if (multi) r.toSeq.take(nIdx) else r.get(0)
        (idx, r.toSeq.drop(nIdx))
      }
    }
  }

  /** Named-tuple-ish row iteration — `itertuples` (alchemy.py:134-144):
    * (optional index values) ++ data values per row, with the field names
    * as the first element of the result. */
  def itertuples(index: Boolean = true): (Seq[String], Iterator[Seq[Any]]) = {
    val names =
      (if (index) Seq("Index") else Nil) ++
        frame.colLabels.zipWithIndex.map { case (l, i) => l.getOrElse(s"_${i + 1}") }
    val nIdx = frame.nIdx
    val multi = frame.isMultiIndex
    val it = frame.df.toLocalIterator()
    val rows = new Iterator[Seq[Any]] {
      def hasNext = it.hasNext
      def next() = {
        val r = it.next()
        val data = r.toSeq.drop(nIdx)
        if (!index) data
        else (if (multi) Seq(r.toSeq.take(nIdx)) else Seq(r.get(0))) ++ data
      }
    }
    (names, rows)
  }

  /** Scalar by (row ordinal, col ordinal) — `iat`/_get_value
    * (alchemy.py:146-163; indexer.py:1-21). */
  def iat(row: Long, col0: Int): Any = {
    val c = if (col0 < 0) frame.nCols + col0 else col0
    if (c < 0 || c >= frame.nCols)
      throw new GraftIndexError(
        s"index $col0 is out of bounds for axis 0 with size ${frame.nCols}")
    val rowCount = len
    val r = if (row < 0) rowCount + row else row
    if (r < 0 || r >= rowCount)
      throw new GraftIndexError(
        s"index $row is out of bounds for axis 0 with size $rowCount")
    cellAt(frame.colAt(c), r)
  }

  /** Label renames — pure metadata (alchemy.py:277-285). */
  private def relabel(f: Option[String] => Option[String]): DataFrame =
    new DataFrame(frame.withDataExprs(frame.colLabels.map(f), frame.dataExprs))

  def addPrefix(prefix: String): DataFrame =
    relabel(l => Some(prefix + l.getOrElse("None")))

  def addSuffix(suffix: String): DataFrame =
    relabel(l => Some(l.getOrElse("None") + suffix))

  def renameColumns(mapping: Map[String, String]): DataFrame =
    relabel {
      case Some(l) if mapping.contains(l) => Some(mapping(l))
      case other => other
    }

  /** Attach a Series as a column (pandas `df[label] = s` / `assign`).
    * An EXISTING label is overwritten in place (pandas assignment
    * semantics — appending would leave duplicate labels and `select`
    * silently reading the stale first match); a new label appends.
    * Same-base Series fuse as a pure projection; foreign Series LEFT-align
    * (pandas assignment reindexes `s` to this frame's index: rows present
    * only in `s` are dropped, rows missing from `s` get NULL — a
    * full-outer join here would invent rows the frame never had). */
  def withColumn(label: String, s: Series): DataFrame = {
    val at = frame.colLabels.indexOf(Some(label))
    if (frame.fusesWith(s.frame)) {
      val e = s.frame.dataExprs(0)
      if (at >= 0) rebuild(frame.withDataExprs(frame.colLabels,
        frame.dataExprs.updated(at, e)))
      else rebuild(frame.withDataExprs(frame.colLabels :+ Some(label),
        frame.dataExprs :+ e))
    } else {
      // overwrite keeps the column's position (pandas does not move an
      // assigned existing column to the end)
      val pairs =
        if (at >= 0) (0 until frame.nCols).map(i => if (i == at) (-1, 0) else (i, -1))
        else (0 until frame.nCols).map(i => (i, -1)) :+ ((-1, 0))
      val labels =
        if (at >= 0) frame.colLabels else frame.colLabels :+ Some(label)
      rebuild(Align.alignedJoin(frame, s.frame, None, labels, pairs,
        (l, r) => if (l.dt == org.apache.spark.sql.types.NullType) r.col else l.col,
        flatHow = "left_outer"))
    }
  }

  def assign(label: String, f: DataFrame => Series): DataFrame =
    withColumn(label, f(this))

  // --------------------------------------------------------------- binary ops

  /** The DataFrame broadcast dispatcher — `DataFrame._op`
    * (alchemy.py:165-236). */
  private[graft] def binOp(op: BinOp, other: Any, axis: Any = "columns",
                           level: Option[Any] = None,
                           fillValue: Option[Any] = None,
                           reverse: Boolean = false): DataFrame = {
    val axisN = getAxis(axis)

    def appOp(l: Operand, r: Operand): Column = {
      val (a, b) = if (reverse) (r, l) else (l, r)
      val res = op(a, b)
      fillValue.fold(res)(fv => coalesce(res, Semantics.literal(fv).col))
    }

    other match {
      case s if Semantics.isScalar(s) =>
        val rOp = Semantics.literal(s)
        rebuild(frame.mapCols((c, dt, _) => appOp(Operand(c, dt), rOp)))

      case s: Series if axisN == 1 =>
        // align column labels against the Series' index VALUES; the values
        // become literal operands (alchemy.py:187-196 — the reference also
        // materializes other.index here). The materialization is bounded:
        // the Series is being broadcast across COLUMNS, so a sane operand
        // has ~nCols entries — a corpus-sized Series here is a caller bug
        // that would otherwise OOM the driver, so fail fast instead.
        val items = s.collectItems()
        if (items.length > DataFrame.MaxAxisColumnsOperand)
          throw new IllegalArgumentException(
            s"axis=1 operand has ${items.length} entries (> " +
              s"${DataFrame.MaxAxisColumnsOperand}); a column-axis Series " +
              "is materialized on the driver — align on axis=0 instead")
        val rLabels = items.map(kv => Option(kv._1).map(_.toString)).toIndexedSeq
        val (merged, idxers) = Align.joinLabels(frame.colLabels, rLabels)
        val cols = idxers.map { case (i, j) =>
          val rOp = if (j < 0) Operand(lit(null), NullType)
                    else Semantics.literal(items(j)._2)
          appOp(Operand(frame.dataExprAt(i), frame.colType(i)), rOp)
        }
        rebuild(frame.withDataExprs(merged, cols.toSeq))

      case s: Series => // axis == 0: row-index alignment (alchemy.py:197-199)
        if (frame.fusesWith(s.frame)) {
          // e.g. df.add(df("x"), axis=0): same base → single projection
          val rOp = Operand(s.frame.dataExprs(0), s.frame.colType(0))
          rebuild(frame.mapCols((c, dt, _) => appOp(Operand(c, dt), rOp)))
        } else {
          val pairs = (0 until frame.nCols).map(i => (i, 0))
          rebuild(Align.alignedJoin(frame, s.frame, level, frame.colLabels, pairs, appOp))
        }

      case df: DataFrame => // outer-align columns AND index (alchemy.py:200-211)
        val (merged, idxers) = Align.joinLabels(frame.colLabels, df.frame.colLabels)
        if (frame.fusesWith(df.frame)) {
          val exprs = idxers.map { case (i, j) =>
            appOp(Operand(frame.dataExprAt(i), frame.colType(i)),
              Operand(df.frame.dataExprAt(j), df.frame.colType(j)))
          }
          rebuild(frame.withDataExprs(merged, exprs.toSeq))
        } else
          rebuild(Align.alignedJoin(frame, df.frame, level, merged, idxers, appOp))

      case seq: Seq[_] =>
        val other2 = seq.toSeq
        if (axisN == 1) {
          val numCols = frame.nCols
          if (other2.length != numCols)
            throw new GraftValueError(
              s"Unable to coerce to Series, length must be $numCols: given ${other2.length}")
          rebuild(frame.mapCols((c, dt, i) =>
            appOp(Operand(c, dt), Semantics.literal(other2(i)))))
        } else {
          val numRows = len
          if (other2.length != numRows)
            throw new GraftValueError(
              s"Unable to coerce to Series, length must be $numRows: given ${other2.length}")
          rebuild(Align.pasteCombine(frame, other2, (l, r, _) => appOp(l, r)))
        }

      case arr: Array[_] => binOp(op, arr.toSeq, axis, level, fillValue, reverse)
      case _ =>
        throw new GraftTypeError(
          s"Cannot broadcast np.ndarray with operand of type ${other.getClass}")
    }
  }

  // 16 arithmetic + 6 comparison methods (alchemy.py:238-252)
  def add(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Add, other, axis, level, fillValue)
  def radd(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Add, other, axis, level, fillValue, reverse = true)
  def sub(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Sub, other, axis, level, fillValue)
  def rsub(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Sub, other, axis, level, fillValue, reverse = true)
  def mul(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Mul, other, axis, level, fillValue)
  def rmul(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Mul, other, axis, level, fillValue, reverse = true)
  def div(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Div, other, axis, level, fillValue)
  def rdiv(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Div, other, axis, level, fillValue, reverse = true)
  def truediv(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    div(other, axis, level, fillValue)
  def rtruediv(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    rdiv(other, axis, level, fillValue)
  def floordiv(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.FloorDiv, other, axis, level, fillValue)
  def rfloordiv(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.FloorDiv, other, axis, level, fillValue, reverse = true)
  def mod(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Mod, other, axis, level, fillValue)
  def rmod(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Mod, other, axis, level, fillValue, reverse = true)
  def pow(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Pow, other, axis, level, fillValue)
  def rpow(other: Any, axis: Any = "columns", level: Option[Any] = None, fillValue: Option[Any] = None): DataFrame =
    binOp(Semantics.Pow, other, axis, level, fillValue, reverse = true)

  def eq(other: Any, axis: Any = "columns", level: Option[Any] = None): DataFrame =
    binOp(Semantics.Eq, other, axis, level)
  def ne(other: Any, axis: Any = "columns", level: Option[Any] = None): DataFrame =
    binOp(Semantics.Ne, other, axis, level)
  def lt(other: Any, axis: Any = "columns", level: Option[Any] = None): DataFrame =
    binOp(Semantics.Lt, other, axis, level)
  def le(other: Any, axis: Any = "columns", level: Option[Any] = None): DataFrame =
    binOp(Semantics.Le, other, axis, level)
  def gt(other: Any, axis: Any = "columns", level: Option[Any] = None): DataFrame =
    binOp(Semantics.Gt, other, axis, level)
  def ge(other: Any, axis: Any = "columns", level: Option[Any] = None): DataFrame =
    binOp(Semantics.Ge, other, axis, level)

  def +(other: Any): DataFrame = add(other)
  def -(other: Any): DataFrame = sub(other)
  def *(other: Any): DataFrame = mul(other)
  def /(other: Any): DataFrame = div(other)
  def %(other: Any): DataFrame = mod(other)

  /** clip via GREATEST/LEAST through the broadcast machinery
    * (alchemy.py:254-262) incl. the scalar-unless-axis check. */
  def clip(lower: Any = null, upper: Any = null, axis: Any = null): DataFrame = {
    if (axis == null) {
      if (lower != null && !Semantics.isScalar(lower))
        throw new GraftValueError("Must specify axis=0 or 1")
      if (upper != null && !Semantics.isScalar(upper))
        throw new GraftValueError("Must specify axis=0 or 1")
    }
    val a = if (lower == null) this else binOp(Semantics.Greatest, lower, axis)
    if (upper == null) a else a.binOp(Semantics.Least, upper, axis)
  }

  /** Column-expression map — `applymap` (alchemy.py:264-275). The function
    * must be Column-expressible (the reference's funcs are SQL-expressible
    * for the same reason). */
  def applymap(f: Column => Column, naAction: Option[String] = None): DataFrame = {
    naAction match {
      case None | Some("ignore") => ()
      case Some(bad) =>
        throw new GraftValueError(
          s"na_action must be 'ignore' or None. Got '$bad'")
    }
    rebuild(frame.mapCols { (c, _, _) =>
      if (naAction.contains("ignore")) when(c.isNull, c).otherwise(f(c)) else f(c)
    })
  }

  // --------------------------------------------------------------- export

  def collectRows(): Seq[Row] = frame.df.collect().toSeq

  /** Replace the index with an exact contiguous 0..n-1 rowid (two narrow
    * passes via RDD.zipWithIndex; see Align.zipWithRowId). Use when the
    * reference's observable 0-based default index values matter. */
  def withSequentialIndex(): DataFrame = {
    val dropped = toSpark(includeIndex = false)
    val named = dropped.columns.zipWithIndex.foldLeft(dropped) {
      case (d, (c, i)) => d.withColumnRenamed(c, SqlFrame.colName(i))
    }
    new DataFrame(SqlFrame.fromPhysical(IndexedSeq(None), frame.colLabels,
      Align.zipWithRowId(named, SqlFrame.idxName(0))))
  }
}

object DataFrame {
  /** Cap on driver-materialized axis=1 (column-broadcast) Series operands:
    * generous for any real column count, small enough to fail fast before
    * a corpus-sized Series is collected. */
  val MaxAxisColumnsOperand: Int = 100000

  /** Read a parquet table — `from_table` (alchemy.py:313-350): `columns`
    * subsets/reorders, `index` promotes columns to index levels; no index →
    * synthetic contiguous rowid (scale-safe zipWithIndex, not a
    * single-partition window). */
  def fromParquet(spark: SparkSession, path: String,
                  columns: Seq[String] = Nil,
                  index: Seq[String] = Nil): DataFrame =
    fromSpark(spark.read.parquet(path), columns, index)

  def fromSpark(sdf: SDF, columns: Seq[String] = Nil,
                index: Seq[String] = Nil): DataFrame =
    new DataFrame(SqlFrame.fromSpark(sdf, index, columns))

  /** CSV source (header + schema inference by default — pass an explicit
    * schema in production: inference is an extra pass over the files). */
  def fromCsv(spark: SparkSession, path: String,
              columns: Seq[String] = Nil, index: Seq[String] = Nil,
              options: Map[String, String] = Map("header" -> "true",
                "inferSchema" -> "true")): DataFrame =
    fromSpark(spark.read.options(options).csv(path), columns, index)

  /** JSON-lines source (schema inference unless provided via options). */
  def fromJson(spark: SparkSession, path: String,
               columns: Seq[String] = Nil, index: Seq[String] = Nil,
               options: Map[String, String] = Map.empty): DataFrame =
    fromSpark(spark.read.options(options).json(path), columns, index)

  /** ORC source — same columnar pushdown/pruning contract as parquet
    * (the other first-class columnar format a lake actually holds). */
  def fromOrc(spark: SparkSession, path: String,
              columns: Seq[String] = Nil, index: Seq[String] = Nil): DataFrame =
    fromSpark(spark.read.orc(path), columns, index)

  /** Registered catalog table / view — the closest analog of the
    * reference's `from_table` against a live database. */
  def fromTable(spark: SparkSession, name: String,
                columns: Seq[String] = Nil, index: Seq[String] = Nil): DataFrame =
    fromSpark(spark.table(name), columns, index)

  /** Local rows — `from_pandas` (alchemy.py:301-311): a local relation. */
  def fromLocal(spark: SparkSession, columns: Seq[String],
                rows: Seq[Seq[Any]]): DataFrame = {
    val colTypes = columns.indices.map(i => SqlFrame.inferType(rows.map(_(i))))
    val schema = StructType(
      StructField(SqlFrame.idxName(0), LongType, nullable = false) +:
        columns.indices.map(i =>
          StructField(SqlFrame.colName(i), colTypes(i), nullable = true)))
    val data = rows.zipWithIndex.map { case (r, i) => Row.fromSeq(i.toLong +: r) }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
    new DataFrame(SqlFrame.fromPhysical(IndexedSeq(None),
      columns.map(Some(_): Option[String]).toIndexedSeq, df))
  }
}
