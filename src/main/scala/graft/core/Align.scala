package graft.core

import org.apache.spark.sql.{Column, DataFrame => SDF, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Index/column alignment machinery — the Spark re-expression of the
  * reference's join layer (base.py:58-128). All joins are declarative
  * Spark joins (Catalyst picks broadcast vs shuffle; AQE re-plans at
  * runtime); the only imperative piece is rowid synthesis, done with
  * `RDD.zipWithIndex` (two narrow passes, no shuffle, no single-partition
  * window funnel — scale-safe where `row_number() OVER ()` is not).
  */
object Align {

  /** Prepend a contiguous 0-based Long rowid column. The analog of the
    * reference's `row_number() OVER () - 1` (base.py:58-62, alchemy.py:333)
    * whose row order is source order — here: parquet file/partition order,
    * deterministic for a given materialized input. */
  def zipWithRowId(df: SDF, name: String): SDF = {
    val spark = df.sparkSession
    val schema = StructType(
      StructField(name, LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(i +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Outer label alignment on the column axis — `_join_cols`
    * (base.py:64-70): pure client-side metadata, no Spark op. Returns the
    * merged labels and for each output position the (left ordinal, right
    * ordinal) with -1 = absent (→ NULL column, base.py:43-44). Matches
    * pandas Index.join(how="outer"): identical → kept as-is, else sorted
    * union. */
  def joinLabels(l: IndexedSeq[Option[String]], r: IndexedSeq[Option[String]])
      : (IndexedSeq[Option[String]], Seq[(Int, Int)]) = {
    if (l == r) (l, l.indices.map(i => (i, i)))
    else {
      val merged = (l ++ r.filterNot(l.contains)).distinct
        .sortBy(o => (o.isEmpty, o.getOrElse("")))
        .toIndexedSeq
      (merged, merged.map(lbl => (l.indexOf(lbl), r.indexOf(lbl))))
    }
  }

  /** Index-aligned binary combine of two frames — `_join_idx` and friends
    * (base.py:72-116). `pairs` gives, per output column, the (left, right)
    * data ordinals (-1 → NULL operand); `build` combines the two typed
    * operands into the output column.
    *
    *  - flat × flat: full outer join on the single level, COALESCEd index
    *    (base.py:72-79) — native Spark `full_outer`, no dialect polyfill.
    *  - level given: left-outer with the MultiIndex side preserved
    *    (base.py:86-102); multi × multi → TypeError.
    *  - level inferred from overlapping index names (base.py:104-116);
    *    multi × multi → NotImplementedError.
    */
  def alignedJoin(l: SqlFrame, r: SqlFrame, level: Option[Any],
                  outLabels: IndexedSeq[Option[String]],
                  pairs: Seq[(Int, Int)],
                  build: (Operand, Operand) => Column,
                  flatHow: String = "full_outer"): SqlFrame = {
    val rdf = SqlFrame.asRight(r)
    def opL(i: Int): Operand =
      Operand(if (i < 0) lit(null) else col(SqlFrame.colName(i)), l.colType(i))
    def opR(j: Int): Operand =
      Operand(if (j < 0) lit(null) else col(SqlFrame.rColName(j)), r.colType(j))
    val dataSel = pairs.zipWithIndex.map { case ((i, j), k) =>
      build(opL(i), opR(j)).as(SqlFrame.colName(k))
    }

    def levelJoin(lvlRef: Any): SqlFrame = {
      if (!l.isMultiIndex) {
        // self flat: other (possibly multi) keeps its index; other LEFT
        // OUTER self == self RIGHT OUTER other (base.py:87-93)
        val lvl = r.levelAt(lvlRef)
        val cond = col(SqlFrame.idxName(0)) === col(SqlFrame.rIdxName(lvl))
        val joined = l.df.join(rdf, cond, "right_outer")
        val idxSel = (0 until r.nIdx).map(i =>
          col(SqlFrame.rIdxName(i)).as(SqlFrame.idxName(i)))
        SqlFrame.fromPhysical(r.indexNames, outLabels,
          joined.select(idxSel ++ dataSel: _*))
      } else if (!r.isMultiIndex) {
        val lvl = l.levelAt(lvlRef)
        val cond = col(SqlFrame.rIdxName(0)) === col(SqlFrame.idxName(lvl))
        val joined = l.df.join(rdf, cond, "left_outer")
        val idxSel = (0 until l.nIdx).map(i =>
          col(SqlFrame.idxName(i)).as(SqlFrame.idxName(i)))
        SqlFrame.fromPhysical(l.indexNames, outLabels,
          joined.select(idxSel ++ dataSel: _*))
      } else
        throw new GraftTypeError(
          "Join on level between two MultiIndex objects is ambiguous")
    }

    if (!l.isMultiIndex && !r.isMultiIndex) {
      // full_outer: binary-op alignment (union of indexes, base.py:72-79).
      // left_outer: ASSIGNMENT alignment (pandas `df[c] = s` reindexes s
      // to df's index — rows only in s are dropped, df's row set is
      // preserved), so the index comes from the left side alone.
      val cond = col(SqlFrame.idxName(0)) === col(SqlFrame.rIdxName(0))
      val joined = l.df.join(rdf, cond, flatHow)
      val idxSel =
        if (flatHow == "left_outer") col(SqlFrame.idxName(0)).as(SqlFrame.idxName(0))
        else coalesce(col(SqlFrame.idxName(0)), col(SqlFrame.rIdxName(0)))
          .as(SqlFrame.idxName(0))
      SqlFrame.fromPhysical(l.indexNames, outLabels,
        joined.select(idxSel +: dataSel: _*))
    } else level match {
      case Some(lvl) => levelJoin(lvl)
      case None =>
        // _join_idx_names (base.py:104-116)
        if (l.indexNames.intersect(r.indexNames).isEmpty)
          throw new GraftValueError("cannot join with no overlapping index names")
        if (!l.isMultiIndex) levelJoin(r.indexNames.indexOf(l.indexNames.head))
        else if (!r.isMultiIndex) levelJoin(l.indexNames.indexOf(r.indexNames.head))
        else throw new GraftNotImplementedError()
    }
  }

  /** Positional (rowid) combine of a frame with local values —
    * `_paste_join` (base.py:118-128) + `Series.from_list`
    * (alchemy.py:508-517): both sides get a contiguous rowid, inner-joined.
    * The local side is broadcast (it is a driver-side list by construction),
    * so no shuffle lands on the big side. */
  def pasteCombine(l: SqlFrame, values: Seq[Any],
                   build: (Operand, Operand, Int) => Column): SqlFrame = {
    val spark = l.df.sparkSession
    val valDt = SqlFrame.inferType(values)
    val litSchema = StructType(Seq(
      StructField("__rowid_r", LongType, nullable = false),
      StructField("__rval", valDt, nullable = true)))
    val rows = values.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
    val rdfLit = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), litSchema)
    val lWithId = zipWithRowId(l.df, "__rowid_l")
    val joined = lWithId.join(broadcast(rdfLit),
      col("__rowid_l") === col("__rowid_r"), "inner")
    val rOp = Operand(col("__rval"), valDt)
    val idxSel = (0 until l.nIdx).map(i => col(SqlFrame.idxName(i)))
    val dataSel = (0 until l.nCols).map { i =>
      build(Operand(col(SqlFrame.colName(i)), l.colType(i)), rOp, i)
        .as(SqlFrame.colName(i))
    }
    SqlFrame.fromPhysical(l.indexNames, l.colLabels,
      joined.select(idxSel ++ dataSel: _*))
  }
}
