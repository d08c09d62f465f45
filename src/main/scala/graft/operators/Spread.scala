package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for CPU-heavy per-row kernels (guide §2.5,
  * "input skew: one huge unsplittable file … otherwise repartition
  * immediately after the read").
  *
  * The expensive text/vector kernels (shingling + k-hash MinHash,
  * SimHash, tokenization, URL grammars, codec probes) are pure
  * projections: Spark fuses them into the SCAN stage, so their
  * parallelism is the scan's split count. A parquet file is splittable
  * only at row-group boundaries — a single-row-group file (exactly what
  * small inputs and many ingest tools produce) yields ONE non-empty
  * task no matter how many cores the session has, and the whole kernel
  * runs single-threaded.
  *
  * [[ifSmall]] round-robin-repartitions the relation to the session's
  * default parallelism ONLY when the optimizer's size estimate says the
  * scan cannot fill that parallelism anyway (estimated bytes <
  * maxPartitionBytes × defaultParallelism). At warehouse scale the
  * estimate is far above the bound and this is the identity — no
  * corpus-sized shuffle is ever added — while an unsplittable or tiny
  * input gets its kernel spread across the machine for the price of
  * shuffling the (projected — callers select the kernel's columns
  * first, §2.3) input once. The decision reads only optimizer
  * statistics: nothing is executed, collected, or cached.
  *
  * Determinism: round-robin repartition is deterministic given input
  * order (sortBeforeRepartition is on by default, SPARK-23207), and
  * every caller's downstream algebra is partition-invariant by the
  * repo-wide contract (exact integer/decimal sums, md5 draws,
  * InvarianceSpec's shuffle-partition sweeps), so results are
  * bit-identical with and without the spread.
  */
object Spread {

  /** `df` repartitioned to the session's default parallelism when its
    * estimated size cannot fill that parallelism at the session's scan
    * split size; `df` unchanged otherwise (the at-scale path). */
  def ifSmall(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch splits are the planner's
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism.toLong
    val maxPB = org.apache.spark.sql.GraftSqlBridge.maxPartitionBytes(spark)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(maxPB) * par) df.repartition(par.toInt) else df
  }
}
