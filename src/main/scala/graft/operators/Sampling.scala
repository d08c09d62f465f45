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
}
