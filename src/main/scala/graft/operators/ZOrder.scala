package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two bounded
  * non-negative integer keys so that range-partitioning + within-
  * partition sorting on the single z-value co-locates rows that are
  * close in BOTH dimensions.
  *
  * Why it matters at 100 TB: parquet keeps per-file and per-row-group
  * min/max statistics for every column. A table sorted on one key prunes
  * scans only on that key; a z-ordered layout tightens the min/max
  * envelopes of BOTH interleaved keys simultaneously, so selective
  * predicates on either dimension (or both) skip most files — the same
  * trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies, expressed here as
  * plain column algebra + repartitionByRange (all codegen'd, one range
  * exchange, no driver involvement beyond the range sampling Spark
  * already does).
  *
  * Keys must be small non-negative integers (bucket/rank raw values
  * first — e.g. `ntile` or a fixed-width bucketing of the raw domain).
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of `x` (even positions)
    * and `y` (odd positions) into one long. Pure bitwise builtins —
    * codegen'd, narrow, no shuffle. Bits above `bits` are ignored;
    * negative inputs are the caller's bug (bucket first). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[zValue]] — same bit algebra, same order. */
  def zValueSqlExpr(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Cluster `df` for a z-ordered write: one range exchange on the
    * Morton code of (xCol, yCol), then a within-partition sort on it.
    * Write the result straight out — each output file then covers a
    * compact rectangle in (x, y) space and its parquet min/max stats
    * prune scans filtered on either column. The helper z column is
    * dropped; the range partitioning on it survives in the layout. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 16, numPartitions: Option[Int] = None): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits).as("__z")
    val withZ = df.withColumn("__z", z)
    val ranged = numPartitions
      .map(n => withZ.repartitionByRange(n, col("__z")))
      .getOrElse(withZ.repartitionByRange(col("__z")))
    ranged.sortWithinPartitions("__z").drop("__z")
  }
}
