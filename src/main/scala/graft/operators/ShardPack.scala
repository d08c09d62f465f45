package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-shard assignment: pack documents into shards of roughly
  * `budget` tokens each.
  *
  * Documents get an offset = running token sum (exclusive prefix) within
  * their partition key in id order, and land in shard floor(offset/budget)
  * — the deterministic "offset binning" packing. The window partitions by
  * the pack key (language, source, date bucket, ...) so there is NO global
  * ordering anywhere: each key's packing is an independent per-partition
  * window after one hash shuffle, which is what survives a 100 TB corpus.
  * Token counts are integers, so the assignment is engine-exact. */
object ShardPack {

  /** Adds `offset` (tokens before this doc within its key) and `shard`
    * (ordinal within the key) columns. */
  def assignShards(docs: DataFrame, partitionCol: String, idCol: String,
                   tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "shard budget must be positive")
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("shard", floor(col("offset") / budget))
  }

  /** Shard manifest: one row per (key, shard) with doc/token totals —
    * the thing a training loader actually consumes. */
  def shardManifest(assigned: DataFrame, partitionCol: String,
                    tokenCol: String): DataFrame =
    assigned.groupBy(col(partitionCol), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))
}
