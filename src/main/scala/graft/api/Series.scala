package graft.api

import graft.core._
import graft.core.Semantics.BinOp
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Pandas-semantics Series over a lazy Spark plan — the analog of the
  * reference's `Series` (alchemy.py:353-517). One data column; `name` is
  * the single column label. */
final class Series private[graft] (
    private[graft] val frame: SqlFrame)
    extends GenericLike[Series] with SeriesExtensions {

  require(frame.nCols == 1, "Series must have exactly one data column")

  def ndim: Int = 1
  protected def klass: String = "Series"
  protected def rebuild(f: SqlFrame): Series = new Series(f)

  def name: Option[String] = frame.colLabels.head

  def shape: Seq[Long] = Seq(len)

  /** Only axis 0/"index"/"rows" exists for a Series (base.py:7, 48-53). */
  protected def getAxis(axis: Any): Int = axis match {
    case 0 | "index" | "rows" => 0
    case _ => badAxis(axis)
  }

  /** Collect as (index, value) pairs (flat index) — iteritems
    * (alchemy.py:369-372). */
  def collectItems(): Seq[(Any, Any)] =
    frame.df.collect().toSeq.map { r =>
      (if (frame.isMultiIndex) r.toSeq.take(frame.nIdx) else r.get(0),
        r.get(frame.nIdx))
    }

  def values: Seq[Any] =
    frame.df.select(frame.colAt(0)).collect().toSeq.map(_.get(0))

  def iterator: Iterator[Any] =
    frame.df.select(frame.colAt(0)).toLocalIterator().asScala.map(_.get(0))

  private implicit class IterConv[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  /** Scalar by ordinal — `iat` / `_get_value(takeable=True)`
    * (alchemy.py:374-383; indexer.py). Bounds use `>=` (the DataFrame
    * variant's correct check, alchemy.py:159 — the reference Series' `>`
    * at :378 is an off-by-one; SURVEY.md §7.4 item 5). */
  def iat(i: Long): Any = {
    val rowCount = len
    val idx = if (i < 0) rowCount + i else i
    if (idx < 0 || idx >= rowCount)
      throw new GraftIndexError(
        s"index $i is out of bounds for axis 0 with size $rowCount")
    cellAt(frame.colAt(0), idx)
  }

  /** CONCAT a literal onto the index values — a real projection, unlike the
    * DataFrame label-rename variant (alchemy.py:470-478). */
  def addPrefix(prefix: String): Series =
    rebuild(frame.mapIdx((e, _) => concat(lit(prefix), e.cast("string"))))

  def addSuffix(suffix: String): Series =
    rebuild(frame.mapIdx((e, _) => concat(e.cast("string"), lit(suffix))))

  def rename(newName: Option[String]): Series =
    new Series(frame.withDataExprs(IndexedSeq(newName), frame.dataExprs))

  // ---------------------------------------------------------------- binary ops

  /** The Series broadcast dispatcher — `Series._op` (alchemy.py:385-447). */
  private[graft] def binOp(op: BinOp, other: Any, level: Option[Any] = None,
                           fillValue: Option[Any] = None, axis: Any = 0,
                           reverse: Boolean = false, lax: Boolean = true): Series = {
    if (axis != null) getAxis(axis) // validation only (alchemy.py:395-398)

    def appOp(l: Operand, r: Operand): Column = {
      val (a, b) = if (reverse) (r, l) else (l, r)
      val res = op(a, b)
      fillValue.fold(res)(fv => coalesce(res, Semantics.literal(fv).col))
    }

    other match {
      case s if Semantics.isScalar(s) =>
        val rOp = Semantics.literal(s)
        rebuild(frame.mapCols((c, dt, _) => appOp(Operand(c, dt), rOp)))
      case s: Series =>
        if (frame.fusesWith(s.frame))
          // same base + same index → row-aligned by construction: fuse into
          // a single projection (zero-shuffle; the reference would emit a
          // full self-join here — SqlFrame.scala header note)
          rebuild(frame.withDataExprs(frame.colLabels, Seq(appOp(
            Operand(frame.dataExprs(0), frame.colType(0)),
            Operand(s.frame.dataExprs(0), s.frame.colType(0))))))
        else
          rebuild(Align.alignedJoin(frame, s.frame, level, frame.colLabels,
            Seq((0, 0)), appOp))
      case _: DataFrame =>
        // Series op DataFrame yields a DataFrame — impossible under this
        // method's static Series return type; exposed as [[combineFrame]]
        throw new GraftTypeError(
          "Series op DataFrame returns a DataFrame: use Series.combineFrame " +
            "or DataFrame.r<op>(series, axis = 0)")
      case seq: Seq[_] =>
        val other2 = seq.toSeq
        if (lax && other2.length == 1) {
          val rOp = Semantics.literal(other2.head)
          rebuild(frame.mapCols((c, dt, _) => appOp(Operand(c, dt), rOp)))
        } else {
          val rowCount = len
          if (other2.length != rowCount) {
            val (l, r) = if (reverse) (other2.length.toLong, rowCount)
                         else (rowCount, other2.length.toLong)
            throw new GraftValueError(
              s"operands could not be broadcast together with shapes ($l,) ($r,)")
          }
          rebuild(Align.pasteCombine(frame, other2,
            (l, r, _) => appOp(l, r)))
        }
      case arr: Array[_] => binOp(op, arr.toSeq, level, fillValue, axis, reverse, lax)
      case _ =>
        throw new GraftTypeError(
          s"Cannot broadcast np.ndarray with operand of type ${other.getClass}")
    }
  }

  /** Series op DataFrame → DataFrame, delegating with roles flipped
    * (alchemy.py:419-424). The reference hardcodes `radd` for every op — a
    * reference bug; we reflect the actual op (SURVEY.md §7.4 item 6). */
  def combineFrame(op: BinOp, df: DataFrame, level: Option[Any] = None,
                   fillValue: Option[Any] = None,
                   reverse: Boolean = false): DataFrame =
    df.binOp(op, this, axis = 0, level = level, fillValue = fillValue,
      reverse = !reverse)

  // ---- Series op DataFrame → DataFrame (alchemy.py:419-424) ----
  // The reference dispatches this inside `_op`; a static Series return
  // type can't, so each op gets a DataFrame-returning overload (the
  // un-defaulted signatures keep Scala's overload rules happy; the Any
  // versions below still carry the defaults). Semantics via
  // [[combineFrame]], which reflects the actual op rather than the
  // reference's hardcoded-radd bug (SURVEY.md §7.4 item 6).
  def add(other: DataFrame): DataFrame = combineFrame(Semantics.Add, other)
  def radd(other: DataFrame): DataFrame = combineFrame(Semantics.Add, other, reverse = true)
  def sub(other: DataFrame): DataFrame = combineFrame(Semantics.Sub, other)
  def rsub(other: DataFrame): DataFrame = combineFrame(Semantics.Sub, other, reverse = true)
  def mul(other: DataFrame): DataFrame = combineFrame(Semantics.Mul, other)
  def rmul(other: DataFrame): DataFrame = combineFrame(Semantics.Mul, other, reverse = true)
  def div(other: DataFrame): DataFrame = combineFrame(Semantics.Div, other)
  def rdiv(other: DataFrame): DataFrame = combineFrame(Semantics.Div, other, reverse = true)
  def truediv(other: DataFrame): DataFrame = div(other)
  def rtruediv(other: DataFrame): DataFrame = rdiv(other)
  def floordiv(other: DataFrame): DataFrame = combineFrame(Semantics.FloorDiv, other)
  def rfloordiv(other: DataFrame): DataFrame = combineFrame(Semantics.FloorDiv, other, reverse = true)
  def mod(other: DataFrame): DataFrame = combineFrame(Semantics.Mod, other)
  def rmod(other: DataFrame): DataFrame = combineFrame(Semantics.Mod, other, reverse = true)
  def pow(other: DataFrame): DataFrame = combineFrame(Semantics.Pow, other)
  def rpow(other: DataFrame): DataFrame = combineFrame(Semantics.Pow, other, reverse = true)
  def eq(other: DataFrame): DataFrame = combineFrame(Semantics.Eq, other)
  def ne(other: DataFrame): DataFrame = combineFrame(Semantics.Ne, other)
  def lt(other: DataFrame): DataFrame = combineFrame(Semantics.Lt, other)
  def le(other: DataFrame): DataFrame = combineFrame(Semantics.Le, other)
  def gt(other: DataFrame): DataFrame = combineFrame(Semantics.Gt, other)
  def ge(other: DataFrame): DataFrame = combineFrame(Semantics.Ge, other)

  // 16 arithmetic methods + 6 comparisons (alchemy.py:449-463)
  def add(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Add, other, level, fillValue, axis)
  def radd(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Add, other, level, fillValue, axis, reverse = true)
  def sub(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Sub, other, level, fillValue, axis)
  def rsub(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Sub, other, level, fillValue, axis, reverse = true)
  def mul(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Mul, other, level, fillValue, axis)
  def rmul(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Mul, other, level, fillValue, axis, reverse = true)
  def div(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Div, other, level, fillValue, axis)
  def rdiv(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Div, other, level, fillValue, axis, reverse = true)
  def truediv(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    div(other, level, fillValue, axis)
  def rtruediv(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    rdiv(other, level, fillValue, axis)
  def floordiv(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.FloorDiv, other, level, fillValue, axis)
  def rfloordiv(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.FloorDiv, other, level, fillValue, axis, reverse = true)
  def mod(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Mod, other, level, fillValue, axis)
  def rmod(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Mod, other, level, fillValue, axis, reverse = true)
  def pow(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Pow, other, level, fillValue, axis)
  def rpow(other: Any, level: Option[Any] = None, fillValue: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Pow, other, level, fillValue, axis, reverse = true)

  def eq(other: Any, level: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Eq, other, level, None, axis)
  def ne(other: Any, level: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Ne, other, level, None, axis)
  def lt(other: Any, level: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Lt, other, level, None, axis)
  def le(other: Any, level: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Le, other, level, None, axis)
  def gt(other: Any, level: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Gt, other, level, None, axis)
  def ge(other: Any, level: Option[Any] = None, axis: Any = 0): Series =
    binOp(Semantics.Ge, other, level, None, axis)

  // Scala operator sugar (the dunder layer, ops_mixin.py:1-66)
  def +(other: Any): Series = add(other)
  def -(other: Any): Series = sub(other)
  def *(other: Any): Series = mul(other)
  def /(other: Any): Series = div(other)
  def %(other: Any): Series = mod(other)
  def ===(other: Any): Series = eq(other)
  def =!=(other: Any): Series = ne(other)
  def <(other: Any): Series = lt(other)
  def <=(other: Any): Series = le(other)
  def >(other: Any): Series = gt(other)
  def >=(other: Any): Series = ge(other)

  /** GREATEST/LEAST through the broadcast engine (alchemy.py:465-468;
    * `lax=False` so a 1-element list is NOT unwrapped). */
  def clip(lower: Any = null, upper: Any = null, axis: Any = null): Series = {
    val afterLower =
      if (lower == null) this
      else binOp(Semantics.Greatest, lower, axis = axis, lax = false)
    if (upper == null) afterLower
    else afterLower.binOp(Semantics.Least, upper, axis = axis, lax = false)
  }

  /** fillna = COALESCE (pandas surface convenience; the reference reaches
    * the same effect via `fill_value`). */
  def fillna(value: Any): Series = {
    val v = Semantics.literal(value)
    rebuild(frame.mapCols((c, _, _) => coalesce(c, v.col)))
  }

  // ------------------------------------------------- pandas conveniences
  // (beyond the reference surface: membership/range masks and the str/dt
  // accessor namespaces, all as fused same-base expressions)

  /** membership mask (pandas Series.isin). */
  def isin(values: Seq[Any]): Series =
    rebuild(frame.mapCols((c, _, _) => c.isInCollection(values)))

  /** inclusive range mask (pandas Series.between). */
  def between(lower: Any, upper: Any): Series =
    rebuild(frame.mapCols((c, _, _) =>
      c >= Semantics.literal(lower).col && c <= Semantics.literal(upper).col))

  /** string accessor namespace (pandas Series.str.*). */
  object str {
    private def app(f: Column => Column): Series =
      rebuild(frame.mapCols((c, _, _) => f(c)))
    def upper: Series = app(org.apache.spark.sql.functions.upper)
    def lower: Series = app(org.apache.spark.sql.functions.lower)
    def len: Series = app(length)
    def trim: Series = app(org.apache.spark.sql.functions.trim(_))
    def contains(sub: String): Series = app(_.contains(sub))
    def startswith(prefix: String): Series = app(_.startsWith(prefix))
    def endswith(suffix: String): Series = app(_.endsWith(suffix))
    def replace(pattern: String, replacement: String): Series =
      app(regexp_replace(_, pattern, replacement))
    def slice(start: Int, length0: Int): Series =
      app(substring(_, start + 1, length0)) // pandas 0-based
    /** pandas str.extract: the group's match; NULL when the pattern does
      * not match OR the group did not participate in the match (the other
      * arm of an alternation matched). Spark's regexp_extract conflates
      * the latter with a real empty capture — the native
      * [[graft.functions.RegexGroupExtract]] kernel distinguishes them
      * the way pandas does. */
    def extract(pattern: String, group: Int = 1): Series =
      app(c => org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.RegexGroupExtract(
          org.apache.spark.sql.GraftSqlBridge.expression(c), pattern, group)))
    /** pandas str.pad(side="left") / rjust. */
    def pad(width: Int, fillchar: String = " "): Series =
      app(lpad(_, width, fillchar))
    /** pandas str.count: non-overlapping regex match count. */
    def count(pattern: String): Series =
      app(regexp_count(_, lit(pattern)))
    /** pandas str.split → array column (pair with DataFrame.explode). */
    def split(pattern: String): Series =
      app(org.apache.spark.sql.functions.split(_, pattern))
    /** pandas str.strip/lstrip/rstrip (whitespace form). Spark's bare
      * trim/ltrim/rtrim strip SPACES only; pandas strips the whole
      * whitespace class — the SAME `\s` class [[isspace]] tests
      * (space, \t, \n, \x0B, \f, \r), via regexp_replace so no raw
      * control byte hides in a source literal. */
    def strip: Series =
      app(c => regexp_replace(regexp_replace(c, "^\\s+", ""), "\\s+$", ""))
    def lstrip: Series = app(regexp_replace(_, "^\\s+", ""))
    def rstrip: Series = app(regexp_replace(_, "\\s+$", ""))
    /** pandas str.zfill: sign-aware zero pad, NEVER truncates (Spark's
      * bare lpad truncates a longer string to `width`). */
    def zfill(width: Int): Series = app { c =>
      val sign = substring(c, 1, 1)
      val rest = c.substr(lit(2), length(c))
      when(length(c) >= width, c)
        .otherwise(when(sign === "-" || sign === "+",
          concat(sign, lpad(rest, math.max(width - 1, 0), "0")))
          .otherwise(lpad(c, width, "0")))
    }
    /** pandas str.find: 0-based index of first occurrence, -1 absent. */
    def find(sub: String): Series = app(instr(_, sub) - 1)
    /** pandas str.get: character at 0-based position, NULL past end
      * (pandas yields NaN, the shared missing sentinel). Negative `i`
      * indexes from the end, pandas-style: get(-1) is the LAST char
      * (a bare substring(c, 0, 1) would silently yield the FIRST),
      * NULL when the string is shorter than |i|. */
    def get(i: Int): Series =
      if (i >= 0) app(c => when(length(c) > i, substring(c, i + 1, 1)))
      else app(c => when(length(c) >= -i,
        c.substr(length(c) + lit(i + 1), lit(1))))
    /** pandas str.repeat. */
    def repeat(n: Int): Series =
      app(org.apache.spark.sql.functions.repeat(_, n))
    /** pandas str.capitalize: first char upper, rest lower. */
    def capitalize: Series = app(c =>
      when(length(c) === 0, c).otherwise(
        concat(org.apache.spark.sql.functions.upper(substring(c, 1, 1)),
          org.apache.spark.sql.functions.lower(
            c.substr(lit(2), length(c))))))
    /** pandas str.isdigit/isalpha/isalnum/isspace: non-empty and all
      * chars in the class.
      *
      * SEMANTICS NOTE (user-facing): these unsuffixed forms are
      * ASCII/Java-`\s` classes — the oracle-shared semantics — and
      * will misclassify non-ASCII corpora where pandas is
      * Unicode-aware (pandas counts Unicode digits as digits and NBSP
      * as space). For Unicode parity use the `*Unicode` variants
      * below. */
    def isdigit: Series = app(_.rlike("^[0-9]+$"))
    def isalpha: Series = app(_.rlike("^[A-Za-z]+$"))
    def isalnum: Series = app(_.rlike("^[0-9A-Za-z]+$"))
    def isspace: Series = app(_.rlike("^\\s+$"))
    /** Unicode-aware variants — `(?U)`-flagged Java classes, matching
      * pandas' Unicode semantics (Unicode digits/letters, NBSP-as-
      * space). Kept as separate names so the ASCII forms stay
      * byte-stable against the DuckDB oracle. */
    def isdigitUnicode: Series = app(_.rlike("^(?U)\\d+$"))
    def isalphaUnicode: Series = app(_.rlike("^(?U)\\p{Alpha}+$"))
    def isalnumUnicode: Series = app(_.rlike("^(?U)\\p{Alnum}+$"))
    def isspaceUnicode: Series = app(_.rlike("^(?U)\\s+$"))
    /** [[strip]]'s Unicode twin: strips the `(?U)\s` class (includes
      * NBSP/Unicode spaces) instead of the Java-`\s` ASCII class. */
    def stripUnicode: Series =
      app(c => regexp_replace(regexp_replace(c, "^(?U)\\s+", ""),
        "(?U)\\s+$", ""))
  }

  /** datetime accessor namespace (pandas Series.dt.*). */
  object dt {
    private def app(f: Column => Column): Series =
      rebuild(frame.mapCols((c, _, _) => f(c)))
    def year: Series = app(org.apache.spark.sql.functions.year)
    def month: Series = app(org.apache.spark.sql.functions.month)
    def day: Series = app(dayofmonth)
    def hour: Series = app(org.apache.spark.sql.functions.hour)
    def dayofweek: Series = app(org.apache.spark.sql.functions.dayofweek)
    def date: Series = app(to_date(_))
    def minute: Series = app(org.apache.spark.sql.functions.minute)
    def second: Series = app(org.apache.spark.sql.functions.second)
    def dayofyear: Series = app(org.apache.spark.sql.functions.dayofyear)
    def quarter: Series = app(org.apache.spark.sql.functions.quarter)
    /** ISO week number (pandas dt.isocalendar().week). */
    def week: Series = app(weekofyear)
    /** pandas dt.weekday: Monday = 0 … Sunday = 6 (Spark's dayofweek
      * is Sunday = 1, hence the modular shift). */
    def weekday: Series = app(c =>
      pmod(org.apache.spark.sql.functions.dayofweek(c) + 5, lit(7)))
    /** pandas dt.days_in_month. */
    def daysInMonth: Series = app(c => dayofmonth(last_day(c)))
    /** pandas dt.is_month_start / is_month_end. */
    def isMonthStart: Series = app(dayofmonth(_) === 1)
    def isMonthEnd: Series = app(c => to_date(c) === last_day(c))
  }
}

object Series {
  /** Literal values with a synthesized 0..n-1 index, all labels None —
    * `Series.from_list` (alchemy.py:508-517). */
  def fromList(spark: SparkSession, values: Seq[Any], name: Option[String] = None): Series =
    new Series(SqlFrame.fromLocal(spark, values.indices.map(_.toLong), values, name))

  /** (index, value) pairs — `Series.from_pandas` (alchemy.py:493-506). */
  def fromLocal(spark: SparkSession, items: Seq[(Any, Any)],
                name: Option[String] = None,
                indexName: Option[String] = None): Series =
    new Series(SqlFrame.fromLocal(spark, items.map(_._1), items.map(_._2),
      name, indexName))
}
