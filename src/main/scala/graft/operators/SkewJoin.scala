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
}
