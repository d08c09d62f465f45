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

  /** Mergeable per-key HISTOGRAM state over fixed bin edges — the
    * quantile member of this family: exact quantiles are NOT mergeable
    * (the true state is the sorted value multiset), and Spark's
    * percentile_approx sketch is not exposed for table-level merging,
    * so the fixed-bin histogram is the bounded monoid answer with
    * DETERMINISTIC error (one bin width — a resolution statement, not
    * a probabilistic bound like HLL's rsd). State: one (keys..., bin,
    * n) row per occupied bin, ≤ `bins` rows per key; merging is the
    * same null-safe count addition as [[mergeState]] keyed on
    * (keys, bin), so refreshes chain indefinitely and batching cannot
    * change the result. Values outside [lo, hi) clamp into the edge
    * bins (they still count — a quantile readout that silently dropped
    * outliers would lie); NULLs are excluded (no measurement). */
  def aggregateHistState(df: DataFrame, keys: Seq[String], valueCol: String,
                         lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val raw = floor((col(valueCol).cast("double") - lo) / width).cast("long")
    df.where(col(valueCol).isNotNull)
      .withColumn("bin",
        least(greatest(raw, lit(0L)), lit(bins - 1L)))
      .groupBy((keys :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge two histogram-state tables (snapshot ⊎ delta): FULL OUTER
    * join on (keys, bin) + null-safe count addition — [[mergeState]]'s
    * exact shape, zero-exchange under co-bucketed state tables. */
  def mergeHistState(snapshot: DataFrame, delta: DataFrame,
                     keys: Seq[String]): DataFrame = {
    val jk = keys :+ "bin"
    val s = snapshot.select(jk.map(col) :+ col("n").as("__nl"): _*)
    val d = delta.select(jk.map(col) :+ col("n").as("__nr"): _*)
    s.join(d, jk, "full_outer")
      .select(jk.map(col) :+
        (coalesce(col("__nl"), lit(0L)) + coalesce(col("__nr"), lit(0L)))
          .as("n"): _*)
  }

  /** Quantile readout off a histogram-state table: for each requested
    * (name, p), the MIDPOINT of the first bin whose cumulative count
    * reaches ceil(p·total) — deterministic integer comparisons, so any
    * engine over the same state reads the same answer; error ≤ one bin
    * width by construction. One window pass over the state (which is
    * |keys|·bins rows — model-sized, never the corpus) feeding one
    * grouped min per quantile. */
  def histQuantiles(state: DataFrame, keys: Seq[String],
                    quantiles: Seq[(String, Double)],
                    lo: Double, hi: Double, bins: Int): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (_, p) =>
      require(p > 0 && p <= 1, s"p must be in (0, 1], got $p") }
    val width = (hi - lo) / bins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("bin"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val staged = state
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__mid", lit(lo) + (col("bin") + 0.5) * width)
    val aggs = quantiles.map { case (name, p) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__tot")), col("__mid")))
        .as(name)
    }
    staged.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
