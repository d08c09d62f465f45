package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketized.
  *
  * The naive plan for `p.t BETWEEN i.s AND i.e` is a cross join + filter
  * (Spark falls back to BroadcastNestedLoopJoin) — quadratic work. The
  * scalable formulation buckets the time axis: each interval explodes to
  * the buckets it covers, each point maps to its single bucket, the join
  * becomes an equi-join on (key, bucket) and the exact BETWEEN predicate
  * filters residual non-matches inside the bucket. Work is proportional
  * to true match density × bucket granularity, shuffled by (key, bucket).
  * `bucketWidth` should be on the order of the typical interval length. */
object RangeJoin {

  /** Exact integral division — Column `/` on longs promotes to DOUBLE,
    * which corrupts ns-scale epoch values (2^63 ≫ 2^53). */
  private def longDiv(colName: String, d: Long): Column =
    expr(s"`$colName` DIV ${d}L")

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bucket", longDiv(pointCol, bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(longDiv(startCol, bucketWidth),
        longDiv(endCol, bucketWidth))))
    p.join(i, keys :+ "__bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (closed intervals): all (left, right) pairs
    * with `lStart <= rEnd && rStart <= lEnd`, per key — the session ×
    * outage / span-conflict shape that point-in-interval can't express.
    *
    * Same bucketization as [[pointInInterval]]: BOTH sides explode to
    * the buckets they cover and the join is an equi-join on (key,
    * bucket) with the exact overlap predicate as a residual filter.
    * A pair overlapping across several shared buckets would match once
    * per bucket; instead of a dedup shuffle, each pair is kept ONLY in
    * the bucket containing the overlap's start, max(lStart, rStart) —
    * that bucket is covered by both intervals whenever they overlap, so
    * every true pair survives exactly once and no DISTINCT exchange
    * exists in the plan. Work is true-match density × granularity;
    * `bucketWidth` should be on the order of the typical interval
    * length (too fine multiplies the explode, too coarse multiplies
    * residual comparisons). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    // inverted rows (end < start) are EMPTY intervals: they contain no
    // points, so they pair with nothing — filtered up front (sequence()
    // would happily explode them DESCENDING and the residual predicate
    // alone can still pass for them, emitting plausible-looking pairs
    // from what is almost always a swapped-columns bug)
    val l = left.where(col(lStart) <= col(lEnd)).withColumn("__bucket",
      explode(sequence(longDiv(lStart, bucketWidth),
        longDiv(lEnd, bucketWidth))))
    val r = right.where(col(rStart) <= col(rEnd)).withColumn("__bucket",
      explode(sequence(longDiv(rStart, bucketWidth),
        longDiv(rEnd, bucketWidth))))
    l.join(r, keys :+ "__bucket")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bucket") ===
          expr(s"greatest(`$lStart`, `$rStart`) DIV ${bucketWidth}L"))
      .drop("__bucket")
  }
}
