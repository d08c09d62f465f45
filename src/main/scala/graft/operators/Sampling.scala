package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling operators for training-data pipelines. */
object Sampling {

  /** Deterministic per-key sample: n rows per key, chosen by a stable
    * pseudo-random order (md5 of the id rendered as text — reproducible
    * across engines and runs, unlike rand()). One window shuffle on the
    * key; no driver involvement. */
  def perKey(df: DataFrame, keys: Seq[String], idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Stratified Bernoulli sample with per-stratum fractions (seeded
    * sampleBy — deterministic for a fixed seed and input partitioning;
    * use [[perKey]] when cross-run exactness matters). */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Deterministic global shuffle for training-data ordering: total order
    * by a stable hash of the id. A range-partitioned sort — parallel,
    * reproducible across runs and engines (md5, not rand). */
  def deterministicShuffle(df: DataFrame, idCol: String): DataFrame =
    df.orderBy(md5(col(idCol).cast("string")), col(idCol))

  /** Deterministic weighted sample without replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = ln(u)/w with u a stable
    * md5-derived uniform in (0,1], and the k LARGEST keys win — heavier
    * rows sit nearer 0, so selection probability is proportional to
    * weight. Plans as TakeOrderedAndProject (per-partition heaps, no
    * global sort); reproducible across engines and runs because u comes
    * from md5(id), not rand(). Weights must be positive. */
  def weighted(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (h + 1.0) / 4294967297.0 // (0, 1]: (2^32 max + 1) / (2^32 + 1)
    df.withColumn("__wkey", log(u) / col(weightCol))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }
}
