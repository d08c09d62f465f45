package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (mergeable) per-key aggregates — the materialized-view
  * refresh primitive a 100 TB pipeline lives on: the fact history is
  * aggregated ONCE into a keyed state table, and every new delta costs
  * one delta-sized aggregate plus one key-partitioned merge — history is
  * never rescanned.
  *
  * The state carried per key is (count, DECIMAL sum): both are
  * commutative monoids, so merge order and batching cannot change the
  * result (a double sum would drift per merge schedule; DECIMAL(38,6)
  * keeps refresh associativity exact). Derived values (mean etc.) are
  * computed at read time from the state, never stored.
  */
object Incremental {

  /** Aggregate a batch (full history or a delta — same code path) into
    * mergeable per-key state: one hash aggregate, map-side partials. */
  def aggregateState(df: DataFrame, keys: Seq[String],
                     valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast(DecimalType(38, 6))).as("s"))

  /** Merge two state tables by key (snapshot ⊎ delta): FULL OUTER join
    * + null-safe monoid addition. Both sides shuffle on the same key,
    * so under co-partitioned storage (bucketed state tables) this is a
    * zero-exchange sort-merge; the output is again valid state, so
    * refreshes chain indefinitely. */
  def mergeState(snapshot: DataFrame, delta: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val zero = lit(BigDecimal(0)).cast(DecimalType(38, 6))
    val s = snapshot.select(keys.map(col) :+
      col("n").as("__nl") :+ col("s").as("__sl"): _*)
    val d = delta.select(keys.map(col) :+
      col("n").as("__nr") :+ col("s").as("__sr"): _*)
    s.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("__nl"), lit(0L)) + coalesce(col("__nr"), lit(0L))).as("n"),
        (coalesce(col("__sl"), zero) + coalesce(col("__sr"), zero))
          .cast(DecimalType(38, 6)).as("s")): _*)
  }

  /** Mergeable per-key DISTINCT state: an HLL sketch per key — exact
    * distinct is NOT a monoid over scalars (merging two counts of
    * distincts double-counts the overlap; the true state would be the
    * value set itself, state size ∝ cardinality), so the sketch is the
    * only bounded mergeable answer, same trade as
    * [[graft.streaming.GraftStreaming.approxDistinctUsers]]. One
    * sketch-sized blob per key on the wire; `lgConfigK` trades blob
    * size for error (Spark's HLL++ union semantics). */
  def aggregateDistinctState(df: DataFrame, keys: Seq[String],
                             valueCol: String,
                             lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Merge two distinct-state tables (snapshot ⊎ delta): FULL OUTER
    * join + null-safe sketch union — [[mergeState]]'s shape with
    * `hll_union` as the monoid op. Read estimates off the state with
    * [[distinctEstimate]]; the output is again valid state. */
  def mergeDistinctState(snapshot: DataFrame, delta: DataFrame,
                         keys: Seq[String]): DataFrame = {
    val s = snapshot.select(keys.map(col) :+ col("sketch").as("__kl"): _*)
    val d = delta.select(keys.map(col) :+ col("sketch").as("__kr"): _*)
    s.join(d, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__kl").isNull, col("__kr"))
          .when(col("__kr").isNull, col("__kl"))
          .otherwise(hll_union(col("__kl"), col("__kr"))).as("sketch"): _*)
  }

  /** Read the distinct estimate off a distinct-state table. */
  def distinctEstimate(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      hll_sketch_estimate(col("sketch")).as("n_distinct_approx"): _*)
}
