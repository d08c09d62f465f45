package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: key salting.
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions, but when
  * a single join KEY is hot (the classic hub key in training-data joins),
  * salting is the standard remedy: the probe side scatters each hot key
  * across `factor` sub-keys; the build side replicates each key `factor`
  * times so every sub-key still finds its match. Correctness is unchanged
  * — only the partitioning of the hot key's rows. */
object SkewJoin {

  /** Inner equi-join with the left (large, possibly skewed) side salted
    * into `factor` sub-keys and the right side replicated `factor`×.
    * Use when one/few keys dominate the left side; factor ≈ number of
    * partitions a hot key should spread over. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    // deterministic uniform salt, independent of the key value
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(lit((0 until factor).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Inner equi-join with DIFFERENTIAL salting: a bounded-memory
    * Misra–Gries pre-pass ([[graft.functions.FrequentItems]]) over the
    * left side's keys finds the ones hotter than `hotThreshold` rows,
    * and ONLY those are salted — cold keys join on the plain key with
    * zero amplification, and the build side replicates `factor`× just
    * for the hot set instead of wholesale ([[saltedJoin]]'s cost).
    *
    * The pre-pass is one map-only scan with O(sketchCapacity) state and
    * exchange (one sketch per partition, merged once) and the hot set
    * collected to the driver is ≤ sketchCapacity entries — at corpus
    * scale that is noise next to replicating the entire build side.
    * Detection is heuristic, correctness is not: sketch counts are
    * lower bounds (exact when sketchCapacity ≥ distinct keys; otherwise
    * any key with true count ≥ hotThreshold + N/(sketchCapacity+1) is
    * guaranteed caught), and a missed warm key only means that key
    * stays unsalted — the join result is identical to the plain join
    * either way (differential spec + DuckDB oracle pin this).
    * NULL keys never match an inner join and are left unsalted. */
  def saltedJoinAuto(left: DataFrame, right: DataFrame, key: String,
                     factor: Int, hotThreshold: Long,
                     sketchCapacity: Int = 4096): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    require(hotThreshold >= 1, "hotThreshold must be >= 1")
    val hot = left.select(col(key).cast("string").as("__k"))
      .select(graft.functions.FrequentItems(
        col("__k"), sketchCapacity, sketchCapacity).as("__hh"))
      .select(explode(col("__hh")).as("__e"))
      .where(col("__e.cnt") >= hotThreshold)
      .select(col("__e.item"))
      .collect().map(_.getString(0)).toSeq.sorted
    if (hot.isEmpty) return left.join(right, Seq(key))
    val hotArr = typedlit(hot)
    def isHot = array_contains(hotArr, col(key).cast("string"))
    val salted = left.withColumn("__salt",
      when(isHot,
        pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
        .otherwise(lit(0)))
    val replicated = right.withColumn("__salt",
      explode(when(isHot, lit((0 until factor).toArray))
        .otherwise(array(lit(0)))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
