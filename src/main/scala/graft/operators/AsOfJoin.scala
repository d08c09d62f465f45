package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — for each left row, the latest right row whose
  * time is <= the left row's time, per key. The temporal join Spark lacks
  * natively; composed from built-ins per the preference order (SURVEY.md
  * §7.3): union-tag both sides, one shuffle on the key, per-key window
  * fill with `last(ignoreNulls)`, filter back to left rows.
  *
  * Cost at scale: exactly ONE hash shuffle on the key columns (the union
  * is narrow) + a per-key sort — same shape as any windowed op; no range
  * join explosion, no per-row lookups. */
object AsOfJoin {

  /** `rightVals` columns arrive as `<name><suffix>`; all left columns are
    * preserved. Right rows with equal timestamps match (inclusive <=). */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightVals: Seq[String],
           suffix: String = "_asof"): DataFrame = {
    val leftData = left.columns.filterNot(keys.contains).toSeq
    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_l")) ++
        leftData.map(col) ++
        rightVals.map(c => lit(null).as(c + suffix)): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_l")) ++
        leftData.map(c => lit(null).as(c)) ++
        rightVals.map(c => col(c).as(c + suffix)): _*)
    // right rows sort before left rows at equal __t → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightVals.foldLeft(l2.unionByName(r2)) { (df, c) =>
      df.withColumn(c + suffix, last(col(c + suffix), ignoreNulls = true).over(w))
    }
    filled.where(col("__is_l") === 1).drop("__t", "__is_l")
  }
}
