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
}
