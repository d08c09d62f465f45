package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the temporally closest right row per
  * key, with pandas `merge_asof`'s full direction surface:
  * "backward" (latest right time <= left time — the default), "forward"
  * (earliest right time >= left time), "nearest" (whichever is closer in
  * absolute distance, ties to backward — pandas' rule), plus an optional
  * `tolerance` that voids matches farther than the bound. The temporal
  * join Spark lacks natively; composed from built-ins per the preference
  * order (SURVEY.md §7.3): union-tag both sides, one shuffle on the key,
  * per-key window fills, filter back to left rows.
  *
  * Cost at scale: exactly ONE hash shuffle on the key columns (the union
  * is narrow) + ONE per-key sort feeding ONE window node — all three
  * directions share the same (partition, order), so backward and
  * forward candidates are two frames of the same WindowExec, never a
  * second exchange; no range-join explosion, no per-row lookups. The
  * forward candidate at equal times reuses the backward frame's
  * inclusive hit (right rows sort before left rows at equal time), so
  * one ordering serves both inclusive directions.
  *
  * Right rows with duplicate (key, time) resolve to ONE row — all
  * matched value columns come from the same right row (never a
  * per-column mix). Pass `rightTieBreak` (e.g. an id column) to make
  * which one DETERMINISTIC (hash order — stable across runs, not
  * meaningful); empty = whichever Spark sorts last, like pandas'
  * "last occurrence" under its input order. */
object AsOfJoin {

  /** `rightVals` columns arrive as `<name><suffix>`; all left columns are
    * preserved. Right rows with equal timestamps match (inclusive) in
    * every direction. A TIMESTAMP/TIMESTAMP_NTZ time column is
    * normalized to epoch-µs internally (same seam as WindowOps), so
    * `tolerance` is in MICROSECONDS for typed time columns and in the
    * column's own units for numeric ones — distance arithmetic on a raw
    * timestamp would yield an interval type a Long can't bound.
    * NTZ caveat (the WindowOps.numericTs posture): NTZ→instant goes
    * through the SESSION timezone — GraftSession pins UTC, making it
    * the identity; don't mix an NTZ side with an instant-typed side
    * under a non-UTC session, where the wall-clock reinterpretation
    * would skew every distance by the zone offset. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightVals: Seq[String],
           suffix: String = "_asof", direction: String = "backward",
           tolerance: Option[Long] = None,
           rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    def numericTime(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(col(c).cast("timestamp"))
        case _ => col(c)
      }
    val leftData = left.columns.filterNot(keys.contains).toSeq
    val l2 = left.select(
      keys.map(col) ++
        Seq(numericTime(left, leftTime).as("__t"), lit(1).as("__is_l")) ++
        leftData.map(col) ++
        Seq(lit(null).cast("long").as("__tb")) ++
        rightVals.map(c => lit(null).as(c + suffix)): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(numericTime(right, rightTime).as("__t"), lit(0).as("__is_l")) ++
        leftData.map(c => lit(null).as(c)) ++
        Seq((if (rightTieBreak.isEmpty) lit(0L)
             else hash(rightTieBreak.map(col): _*).cast("long")).as("__tb")) ++
        rightVals.map(c => col(c).as(c + suffix)): _*)
    // right rows sort before left rows at equal __t → the backward frame
    // is inclusive; duplicate right times order by the tiebreak so
    // last() is deterministic when the caller supplies one
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"),
        // right duplicates: later tiebreak wins in the backward frame
        col("__tb"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = ord.rowsBetween(0, Window.unboundedFollowing)
    val payload = struct(col("__t").as("__mt") +:
      rightVals.map(c => col(c + suffix).as(c + suffix)): _*)
    val marked = when(col("__is_l") === 0, payload)
    val unioned = l2.unionByName(r2)
      .withColumn("__back", last(marked, ignoreNulls = true).over(wBack))
      .withColumn("__fstrict", first(marked, ignoreNulls = true).over(wFwd))
    // forward inclusive: an equal-time right row already sits in the
    // backward frame; reuse it, else take the first strictly-after row
    val fwd = when(col("__back").isNotNull &&
        col("__back.__mt") === col("__t"), col("__back"))
      .otherwise(col("__fstrict"))
    val chosen = direction match {
      case "backward" => col("__back")
      case "forward"  => fwd
      case "nearest"  =>
        when(col("__back").isNull, fwd)
          .when(fwd.isNull, col("__back"))
          .when(col("__t") - col("__back.__mt") <= fwd("__mt") - col("__t"),
            col("__back"))
          .otherwise(fwd)
    }
    val bounded = tolerance match {
      case Some(tol) =>
        when(chosen.isNotNull &&
          abs(col("__t") - chosen("__mt")) <= tol, chosen)
      case None => chosen
    }
    unioned.withColumn("__m", bounded)
      .where(col("__is_l") === 1)
      .select(keys.map(col) ++ leftData.map(col) ++
        rightVals.map(c => col("__m")(c + suffix).as(c + suffix)): _*)
  }
}
